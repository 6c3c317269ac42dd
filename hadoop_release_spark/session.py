"""SparkSession construction with the engine's contract-safety configs.

The reference (an Apache Hadoop release, SURVEY.md §0) runs jobs on
YARN over HDFS. This engine is the Spark analog: in production the
same code runs with ``--master yarn`` against ``hdfs://`` paths; all
paths are plain strings so ``file:/`` vs ``hdfs:/`` is configuration,
not code. Locally we run ``local[N]``.

Config rationale (SURVEY.md §2 contract-safety rules + §4):
  * ``spark.sql.session.timeZone=UTC`` — oracle (DuckDB) timestamps
    are naive/UTC; pin Spark to the same wall clock.
  * ``spark.sql.legacy.parquet.nanosAsLong=true`` — REQUIRED to read
    ``events.parquet`` (INT64 TIMESTAMP(NANOS)); Spark 4.1 throws
    PARQUET_TYPE_ILLEGAL otherwise. The single ns→µs conversion
    lives in catalog.py.
  * AQE on with partition coalescing + skew-join handling — at
    100 TB these replace Hadoop's hand-tuned reducer counts and
    manual key salting.
  * ``zstd`` parquet compression — best scan/size trade-off for
    large-scale storage.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: SQL confs that are runtime-settable and MUST hold on any session
#: that executes contract queries — including a session handed to us
#: by an external driver. Applied defensively in ``ensure_configs``.
RUNTIME_SQL_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.parquet.compression.codec": "zstd",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


#: Sessions already put through ensure_configs — the defensive
#: re-application is idempotent, so one pass per session suffices;
#: the per-call cost (~5 ms of py4j round-trips) was multiplied by
#: every catalog.table() load inside the bench's timed regions
#: (guide §5: keep driver-side work out of the query path). Keyed on
#: SESSION IDENTITY via a WeakSet (r15 ADVICE): RUNTIME_SQL_CONFS and
#: the nanosAsLong verification are per-SparkSession state, not
#: per-SparkContext — a second session over the same context
#: (SparkSession.newSession(), or a driver-provided session distinct
#: from the first one ensured) shares the applicationId and would
#: silently skip conf application under an appId key. The WeakSet
#: self-cleans when sessions are garbage collected. A caller that
#: deliberately re-configures a session mid-process can force a
#: re-apply with ``ensure_configs(spark, force=True)``.
import weakref

_ENSURED_SESSIONS: "weakref.WeakSet[SparkSession]" = weakref.WeakSet()


def ensure_configs(spark: SparkSession, force: bool = False) -> SparkSession:
    """Apply runtime-settable contract configs to an existing session.

    Safe to call repeatedly; used on driver-provided sessions whose
    builder configs we do not control. Memoized per session
    (applicationId) — pass ``force=True`` after deliberately changing
    session confs. Two extra duties beyond the conf loop:

    * Verify ``nanosAsLong`` actually took hold — without it every
      events read later dies with an unrelated-looking
      PARQUET_TYPE_ILLEGAL; fail loud and early instead.
    * Right-size ``spark.sql.shuffle.partitions`` on an UNCONFIGURED
      local session: the 200-partition default costs ~200 tasks (and
      200 streaming state stores) per shuffle of a fixture-sized
      input — pure fixed overhead, measured 5-15× on iterative
      operators. Only applied when the master is local AND the conf
      still holds its factory default, so a deliberately tuned
      session (any real cluster) is never second-guessed. At cluster
      scale this knob is sized to ~2-3× total executor cores /
      target partition bytes instead.
    """
    try:
        if spark in _ENSURED_SESSIONS and not force:
            return spark
    except Exception:
        pass
    for key, value in RUNTIME_SQL_CONFS.items():
        try:
            spark.conf.set(key, value)
        except Exception:
            # Non-settable in this Spark build — builder must have set it.
            pass
    key = "spark.sql.legacy.parquet.nanosAsLong"
    effective = None
    try:
        effective = spark.conf.get(key, None)
    except Exception:
        pass
    if effective is not None and effective != "true":
        raise RuntimeError(
            f"{key}={effective!r} could not be applied to this session; "
            "events.parquet (INT64 TIMESTAMP(NANOS)) cannot be read. "
            "Set it in the session builder."
        )
    try:
        sc = spark.sparkContext
        if sc.master.startswith("local") and (
            spark.conf.get("spark.sql.shuffle.partitions") == "200"
        ):
            spark.conf.set(
                "spark.sql.shuffle.partitions", str(sc.defaultParallelism)
            )
    except Exception:
        pass
    try:
        _ENSURED_SESSIONS.add(spark)
    except Exception:
        pass  # un-weakref-able session object: re-apply every call
    return spark


def get_session(
    app_name: str = "hadoop-release-spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` or all cores. Shuffle
    partitions default to the core count — correct for local mode;
    on a real cluster this is instead sized to ~2-3× total executor
    cores and AQE coalesces from there.
    """
    if cpus is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        env_cpus = str(cpus)
        shuffle_partitions = int(env_cpus) if env_cpus.isdigit() else (os.cpu_count() or 8)

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for key, value in RUNTIME_SQL_CONFS.items():
        builder = builder.config(key, value)
    # Caller-scoped overrides (round-14: bench_scale raises
    # spark.driver.maxResultSize for gen_sf-sf10 rows whose CONTRACT
    # output is corpus-sized — f04's total-order sort — where the
    # rehearsal's toPandas() materialization exceeds the 1g default.
    # Deliberately NOT a global default: the 1g ceiling is a useful
    # tripwire against unbounded driver collects sneaking into
    # operators, and only the scale-measurement session earns the
    # bigger pipe.
    for key, value in (extra_confs or {}).items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    # r14 advisor: core (non-runtime) confs like
    # spark.driver.maxResultSize are silently IGNORED by getOrCreate
    # when a session already exists in the process — the caller then
    # proceeds believing its override took (the f04 rehearsal's 4g
    # pipe) and dies later on the 1g default with no hint why. Verify
    # each explicit override actually holds and warn loudly if an
    # existing session swallowed it.
    for key, value in (extra_confs or {}).items():
        try:
            effective = spark.conf.get(key, None)
        except Exception:
            continue
        # Normalize before comparing (r15 ADVICE): Spark canonicalizes
        # many conf values (booleans report 'true' vs str(True) ==
        # 'True'), which produced false "override did not take"
        # warnings for confs that actually took.
        if effective is not None and str(effective).strip().lower() != str(
            value
        ).strip().lower():
            import warnings

            warnings.warn(
                f"get_session: extra conf {key}={value!r} did not take "
                f"(effective {effective!r}) — a pre-existing SparkSession "
                "swallowed the builder override; stop it first or set the "
                "conf in that session's builder."
            )
    spark.sparkContext.setLogLevel("WARN")
    return ensure_configs(spark)
