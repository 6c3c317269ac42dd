"""§2.J — Structured Streaming over the events stream.

See streaming/runner.py for the availableNow bridge and the
output-mode discipline that makes these oracle-checkable. Every
query here also runs at 100 TB as a true unbounded stream: the same
code with a real trigger, a durable sink, and RocksDB state store —
nothing below assumes boundedness except the memory sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_release_spark.catalog import table
from hadoop_release_spark.functions.contracts import dsum, osum, ts_us
from hadoop_release_spark.plans.registry import register
from hadoop_release_spark.streaming.runner import materialize, stream_events

_DEC = "DECIMAL(25,8)"


@register(
    "j01_stream_tumbling",
    oracle=f"""
    SELECT CAST(epoch_us(time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP))) AS BIGINT) AS window_start_us,
           event_type,
           count(*) AS n,
           {osum('value')} AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def j01_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows per event type."""
    ev = stream_events(spark, sf_dir)
    agg = ev.groupBy(F.window("ts", "1 hour"), "event_type").agg(
        F.count("*").alias("n"),
        dsum("value").alias("sum_value"),
    )
    out = materialize(agg, output_mode="complete")
    return out.select(
        ts_us(F.col("window.start")).alias("window_start_us"), "event_type", "n", "sum_value"
    )


@register(
    "j02_stream_sliding",
    oracle="""
    SELECT CAST(epoch_us(time_bucket(INTERVAL 30 MINUTE, CAST(ts AS TIMESTAMP))
                         - k.k * INTERVAL 30 MINUTE) AS BIGINT) AS window_start_us,
           count(*) AS n
    FROM events, (SELECT unnest([0, 1]) AS k) k
    GROUP BY 1
    """,
    priority="P2",
)
def j02_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 h length, 30 min slide): every event lands
    in exactly two windows — the oracle replicates that by joining
    each event to offsets {0,1}."""
    ev = stream_events(spark, sf_dir)
    agg = ev.groupBy(F.window("ts", "1 hour", "30 minutes")).agg(F.count("*").alias("n"))
    out = materialize(agg, output_mode="complete")
    return out.select(ts_us(F.col("window.start")).alias("window_start_us"), "n")


@register(
    "j03_stream_session",
    oracle="""
    WITH flagged AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS t,
             CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL
                    OR CAST(ts AS TIMESTAMP) - lag(CAST(ts AS TIMESTAMP)) OVER w
                       > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sessions AS (
      SELECT user_id, t,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY t
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged)
    SELECT user_id,
           CAST(epoch_us(min(t)) AS BIGINT) AS session_start_us,
           count(*) AS n_events
    FROM sessions
    GROUP BY user_id, session_id
    """,
    priority="P2",
)
def j03_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-minute gap) per user. The oracle is the
    classic gaps-and-islands rewrite. Boundary semantics verified
    EMPIRICALLY (self-review find): session_window MERGES two events
    exactly gap-apart (10:00:00 and 10:30:00 → ONE session), so the
    session closes only when the next event is STRICTLY more than
    the gap after the last — the oracle flags new-session on
    `> INTERVAL 30 MINUTE`, never `>=` (which silently agreed on
    the fixture only because random-microsecond timestamps make an
    exact 30:00.000000 gap probability-zero)."""
    ev = stream_events(spark, sf_dir)
    agg = ev.groupBy(F.session_window("ts", "30 minutes"), "user_id").agg(
        F.count("*").alias("n_events")
    )
    out = materialize(agg, output_mode="complete")
    return out.select(
        "user_id",
        ts_us(F.col("session_window.start")).alias("session_start_us"),
        "n_events",
    )


@register(
    "j04_stream_watermark",
    oracle="""
    SELECT CAST(epoch_us(time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP))) AS BIGINT) AS window_start_us,
           count(*) AS n
    FROM events
    GROUP BY 1
    """,
)
def j04_stream_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling windows in UPDATE mode. With the fixture
    pinned to one micro-batch the final state equals batch semantics
    (late-data drop behavior across batches is pytest-verified in
    tests/test_streaming.py)."""
    ev = stream_events(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count("*").alias("n"))
    )
    out = materialize(agg, output_mode="update")
    return out.select(ts_us(F.col("window.start")).alias("window_start_us"), "n")


@register(
    "j05_stream_dedup",
    oracle="""
    SELECT event_id, user_id, event_type, value FROM events
    """,
    priority="P2",
)
def j05_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup by event_id within the watermark (append mode —
    dedup emits rows immediately). ``dropDuplicatesWithinWatermark``
    is the bounded-state form: state for a key is evicted once the
    watermark passes its event time. Plain ``dropDuplicates`` keyed on
    event_id alone would never evict (Spark only expires dedup state
    when the event-time column is part of the key) — unbounded state
    on a real stream. Fixture event_ids are unique, so the oracle is
    the identity; planted-duplicate drop + state eviction are
    pytest-verified in tests/test_streaming.py."""
    ev = stream_events(spark, sf_dir)
    deduped = ev.withWatermark("ts", "10 minutes").dropDuplicatesWithinWatermark(["event_id"])
    out = materialize(deduped, output_mode="append")
    return out.select("event_id", "user_id", "event_type", "value")


def stateful_user_totals(ev: DataFrame) -> DataFrame:
    """j06's stateful core as a reusable stream transform: running
    per-user (count, float sum) via applyInPandasWithState. Exposed
    separately so tests can drive it with maxFilesPerTrigger=1 and
    prove the state genuinely carries ACROSS micro-batches — the one
    behavior the single-batch oracle bridge cannot see."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    from hadoop_release_spark.functions.contracts import py_round_half_away

    output_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_events", LongType()),
            StructField("sum_value", DoubleType()),
        ]
    )
    state_schema = StructType(
        [StructField("n", LongType()), StructField("s", DoubleType())]
    )

    def update_fn(key, pdf_iter, state: GroupState):
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdf_iter:
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((n, s))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "sum_value": [float(py_round_half_away(s, 4))],
            }
        )

    return ev.select("user_id", "value").groupBy("user_id").applyInPandasWithState(
        update_fn, output_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


@register(
    "j06_stream_stateful",
    oracle="""
    SELECT user_id, count(*) AS n_events,
           round(sum(value), 4) AS sum_value
    FROM events GROUP BY user_id
    """,
    priority="P2",
)
def j06_stream_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary stateful processing: running per-user aggregates via
    the state store (applyInPandasWithState — stateful_user_totals).
    Oracle-checked: counts are exact, and the running float sum
    rounds half-away at 4dp on both sides — cross-engine
    accumulation-order noise (~1e-12) is ~8 orders of magnitude
    inside the 5e-5 half-grid, so the rounded values agree (FLOAT
    RULE, contracts.py). The API itself is not SQL-expressible;
    cross-micro-batch state carry-over is pytest-verified
    (tests/test_streaming.py::test_stateful_state_carries_across_batches).
    """
    result = stateful_user_totals(stream_events(spark, sf_dir))
    # State-store/partition scoping lives in materialize() — one state
    # store + Python worker round-trip per shuffle partition is the
    # dominant fixed cost here (measured 5× at 32 partitions).
    return materialize(result, output_mode="update")


def tws_available() -> bool:
    """True when the ``transformWithStateInPandas`` runtime can start
    in this environment. The operator's Python worker speaks a
    protobuf-framed state protocol, so it needs ``google.protobuf``
    importable — absent from this container (re-verified each import,
    mirroring the a15 spark-avro probe). When the dependency appears,
    the modern twin below self-registers with no code change."""
    import importlib.util

    try:
        # find_spec imports the PARENT package, so a missing `google`
        # namespace raises instead of returning None.
        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        return False


def stateful_user_totals_tws(ev: DataFrame) -> DataFrame:
    """j06's stateful core on the MODERN arbitrary-state API
    (``transformWithStateInPandas``, Spark 4.x) — semantically
    identical to :func:`stateful_user_totals`'s
    ``applyInPandasWithState`` form (which is deprecated upstream):
    same (count, float sum) ValueState per user, same update-mode
    emission, same half-away 4dp rounding contract. Kept as a twin,
    not a replacement, until the runtime dependency
    (:func:`tws_available`) exists everywhere the engine runs."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    from hadoop_release_spark.functions.contracts import py_round_half_away

    output_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_events", LongType()),
            StructField("sum_value", DoubleType()),
        ]
    )
    state_schema = StructType(
        [StructField("n", LongType()), StructField("s", DoubleType())]
    )

    class UserTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            n, s = (
                self._totals.get() if self._totals.exists() else (0, 0.0)
            )
            for pdf in rows:
                n += len(pdf)
                s += float(pdf["value"].sum())
            self._totals.update((n, s))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "sum_value": [float(py_round_half_away(s, 4))],
                }
            )

        def close(self) -> None:
            pass

    return (
        ev.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=UserTotals(),
            outputStructType=output_schema,
            outputMode="Update",
            timeMode="None",
        )
    )


if tws_available():

    @register(
        "j11_stream_stateful_tws",
        oracle="""
        SELECT user_id, count(*) AS n_events,
               round(sum(value), 4) AS sum_value
        FROM events GROUP BY user_id
        """,
        priority="P2",
    )
    def j11_stream_stateful_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
        """j06's running per-user aggregate on the modern
        transformWithStateInPandas API (probe-gated: registers only
        where google.protobuf exists — see tws_available). Same
        oracle as j06; equal semantics between the two APIs is
        pytest-pinned (tests/test_streaming.py, skip-marked where
        the runtime dependency is absent)."""
        result = stateful_user_totals_tws(stream_events(spark, sf_dir))
        return materialize(result, output_mode="update")


@register(
    "j07_stream_static_join",
    oracle="""
    SELECT event_id, user_id, c_name, c_mktsegment, event_type
    FROM events JOIN customer ON user_id = c_custkey
    """,
    priority="P2",
)
def j07_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream ⋈ static enrichment: the static side is re-planned per
    micro-batch (and broadcast when small); stateless, append mode."""
    ev = stream_events(spark, sf_dir)
    cust = table(spark, sf_dir, "customer")
    joined = ev.join(cust, ev.user_id == cust.c_custkey).select(
        "event_id", "user_id", "c_name", "c_mktsegment", "event_type"
    )
    out = materialize(joined, output_mode="append")
    return out


@register(
    "j08_stream_complete_agg",
    oracle=f"""
    SELECT event_type, count(*) AS n,
           {osum('value')} AS total_value
    FROM events GROUP BY event_type
    """,
    priority="P2",
)
def j08_stream_complete_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complete-output-mode global aggregation (the full result table
    re-emitted per trigger — only viable when the result is small,
    which a per-type rollup is at any scale)."""
    ev = stream_events(spark, sf_dir)
    agg = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        dsum("value").alias("total_value"),
    )
    return materialize(agg, output_mode="complete")


@register(
    "j09_stream_foreach_batch",
    oracle="SELECT event_type, count(*) AS n FROM events GROUP BY event_type",
    priority="P2",
)
def j09_stream_foreach_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch sink: the exactly-once pattern for sinks without
    native streaming support — each micro-batch arrives as a batch
    DataFrame with an epoch id, written transactionally (idempotent
    overwrite keyed by epoch in production; plain overwrite here
    since complete mode re-emits the whole result). Checkpointing
    makes restarts resume from the last committed batch
    (tests/test_streaming.py proves resume)."""
    from hadoop_release_spark.sources.roundtrip import scratch_dir

    ev = stream_events(spark, sf_dir)
    agg = ev.groupBy("event_type").agg(F.count("*").alias("n"))
    out_dir = scratch_dir("j09out") + "/data"
    ckpt = scratch_dir("j09ckpt")

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        # Handful of groups → one output file; a wide result would
        # instead keep the batch's partitioning.
        batch_df.coalesce(1).write.mode("overwrite").parquet(out_dir)

    # Same state-store/partition scoping materialize() applies: the
    # stateful agg builds one state store per shuffle partition, and
    # an unconfigured 200-partition session pays ~200 stores + a
    # 200-file foreachBatch write per micro-batch (measured 47 s vs
    # ~3 s at fixture scale). ONE shared implementation
    # (runner.scoped_stream_partitions) so the policy cannot drift.
    from hadoop_release_spark.streaming.runner import scoped_stream_partitions

    with scoped_stream_partitions(spark):
        query = (
            agg.writeStream.outputMode("complete")
            .foreachBatch(write_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
    return spark.read.parquet(out_dir)


@register(
    "j10_stream_stream_join",
    oracle="""
    SELECT c.user_id,
           c.event_id AS click_id,
           v.event_id AS view_id,
           CAST(epoch_us(c.ts) - epoch_us(v.ts) AS BIGINT) AS lag_us
    FROM (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
          FROM events WHERE event_type = 'click') c
    JOIN (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
          FROM events WHERE event_type = 'view') v
      ON c.user_id = v.user_id
     AND v.ts BETWEEN c.ts - INTERVAL 1 DAY AND c.ts
    """,
    priority="P2",
)
def j10_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join (view→click attribution): each click
    joins the same user's views from the preceding day. BOTH sides
    carry a watermark and the join has an explicit event-time range
    constraint — exactly the pair of conditions Spark needs to evict
    buffered rows from the join state once the watermark passes
    ``c.ts - 1 day`` / ``v.ts + 1 day``; without them the buffers
    grow forever on an unbounded stream. Append mode: inner-join
    matches are final the moment they are emitted."""
    clicks = (
        stream_events(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .withWatermark("ts", "1 day")
        .select(
            F.col("user_id").alias("c_user_id"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
    )
    views = (
        stream_events(spark, sf_dir)
        .filter(F.col("event_type") == "view")
        .withWatermark("ts", "1 day")
        .select(
            F.col("user_id").alias("v_user_id"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("v_ts"),
        )
    )
    joined = clicks.join(
        views,
        (F.col("c_user_id") == F.col("v_user_id"))
        & (F.col("v_ts") >= F.col("c_ts") - F.expr("INTERVAL 1 DAY"))
        & (F.col("v_ts") <= F.col("c_ts")),
        "inner",
    )
    out = materialize(joined, output_mode="append")
    return out.select(
        F.col("c_user_id").alias("user_id"),
        "click_id",
        "view_id",
        (F.unix_micros("c_ts") - F.unix_micros("v_ts")).alias("lag_us"),
    )


@register(
    "j12_stream_dynamic_session",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_id, event_type,
             CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS t_us,
             CASE WHEN event_type = 'view'
                  THEN 600000000 ELSE 1800000000 END AS gap_us
      FROM events
    ), runs AS (
      SELECT user_id, event_id, t_us,
             max(t_us + gap_us) OVER (PARTITION BY user_id
                                      ORDER BY t_us, event_id
                                      ROWS UNBOUNDED PRECEDING)
               AS run_end
      FROM ev
    ), flagged AS (
      SELECT user_id, t_us,
             CASE WHEN lag(run_end) OVER w IS NULL
                    OR t_us > lag(run_end) OVER w
                  THEN 1 ELSE 0 END AS new_session
      FROM runs
      WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id)
    ), sessions AS (
      SELECT user_id, t_us,
             sum(new_session) OVER (PARTITION BY user_id
                                    ORDER BY t_us
                                    ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    )
    SELECT user_id,
           CAST(min(t_us) AS BIGINT) AS session_start_us,
           CAST(count(*) AS BIGINT) AS n_events
    FROM sessions GROUP BY user_id, sid
    """,
    priority="P2",
)
def j12_stream_dynamic_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC-gap session windows: the gap is a per-EVENT expression
    (views close after 10 min, heavier interactions hold 30 min) —
    `session_window(ts, gapExpr)`, the Spark 3.2+ generalization of
    j03's fixed gap. Merge semantics are interval-union: each event
    extends its session to ts + its OWN gap, sessions chain while
    the running max end reaches the next event (boundary rule
    empirically identical to j03's: an event landing EXACTLY on the
    running end merges; strictly after opens a new session — the
    oracle's running-max/lag rewrite encodes exactly that and the
    hash gate would catch a drift).

    Scale shape: same single (user_id) state-store partitioning as
    j03; the gap expression is evaluated per row map-side, so
    dynamic gaps cost nothing extra at any scale."""
    ev = stream_events(spark, sf_dir)
    gap = F.when(F.col("event_type") == "view", F.lit("10 minutes")).otherwise(
        F.lit("30 minutes")
    )
    agg = ev.groupBy(F.session_window("ts", gap), "user_id").agg(
        F.count("*").alias("n_events")
    )
    out = materialize(agg, output_mode="complete")
    return out.select(
        "user_id",
        ts_us(F.col("session_window.start")).alias("session_start_us"),
        "n_events",
    )


def stateful_token_bucket(ev: DataFrame) -> DataFrame:
    """j13's stateful core as a reusable stream transform: the k12
    per-user token-bucket admission replay on the state store
    (applyInPandasWithState), exposed separately so tests can drive
    it with maxFilesPerTrigger=1 and prove the bucket state (tokens,
    last-event time) genuinely carries ACROSS micro-batches.

    State is the pair (tokens_u, prev_tus) in the same exact integer
    µs-of-credit units as the batch twin — the recurrence resumed
    from carried state is bit-for-bit the recurrence run in one
    batch, which is what makes the single-batch oracle bridge AND
    the cross-batch pytest both exact. Events are sorted by
    (tus, event_id) WITHIN each batch; cross-batch correctness
    assumes event-time-ordered arrival across batches (true for the
    single-batch bridge trivially, enforced by file order in the
    pytest; production pairs this with watermarked event-time
    ordering, or clamps negative Δt to 0 refill)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import LongType, StructField, StructType

    from hadoop_release_spark.plans.k_udfs import (
        K12_CAP_U,
        K12_RATE_UT_PER_US,
        K12_TOKEN_US,
        token_bucket_admission,
    )

    output_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("event_id", LongType()),
            StructField("admitted", LongType()),
            StructField("tokens_after_u", LongType()),
        ]
    )
    # prev_t sentinel -1 = "no prior event" (None round-trips are
    # dialect-fragile in state rows; -1 is outside the µs domain).
    state_schema = StructType(
        [StructField("tokens_u", LongType()), StructField("prev_tus", LongType())]
    )

    def update_fn(key, pdf_iter, state: GroupState):
        import numpy as np

        tokens, prev_t = (
            state.get if state.exists else (K12_CAP_U, -1)
        )
        pdf = pd.concat(list(pdf_iter), ignore_index=True)
        if len(pdf) == 0:
            return
        pdf = pdf.sort_values(["tus", "event_id"], kind="mergesort")
        tus = pdf["tus"].to_numpy(np.int64)
        cost = pdf["cost_u"].to_numpy(np.int64)
        admitted, after = token_bucket_admission(
            tus,
            cost,
            K12_CAP_U,
            K12_RATE_UT_PER_US,
            tokens0=tokens,
            prev_t0=None if prev_t < 0 else int(prev_t),
        )
        state.update((int(after[-1]), int(tus[-1])))
        yield pd.DataFrame(
            {
                "user_id": pdf["user_id"].to_numpy(np.int64),
                "event_id": pdf["event_id"].to_numpy(np.int64),
                "admitted": admitted,
                "tokens_after_u": after,
            }
        )

    return (
        ev.select(
            "user_id",
            "event_id",
            F.expr("unix_micros(ts)").alias("tus"),
            F.expr(
                "(1 + (CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) % 5))"
                f" * {K12_TOKEN_US}"
            ).alias("cost_u"),
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            update_fn,
            output_schema,
            state_schema,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )


def _o_j13() -> str:
    from hadoop_release_spark.plans.k_udfs import _o_k12

    return _o_k12()


@register("j13_stream_token_bucket", oracle=_o_j13(), priority="P2")
def j13_stream_token_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming token-bucket admission — k12's rate-limit replay as
    a LIVE stateful stream, the production form k12's docstring
    promises (j06's state store instead of batch re-replay): per-user
    bucket state (tokens, last-event time) lives in the streaming
    state store and every arriving event is admitted/rejected
    against it, exactly as a real-time rate limiter would run.

    Same exact integer µs-of-credit recurrence as k12 — the
    recurrence resumed from carried state is bit-for-bit the batch
    replay, so the SAME recursive-CTE oracle grades both (full hash
    parity on a stateful streaming op), and the cross-micro-batch
    carry-over that the single-batch bridge cannot see is pinned by
    tests/test_streaming.py::test_token_bucket_state_carries_across_batches.

    Scale shape: ONE user_id hash exchange into per-partition state
    stores (RocksDB at 100 TB); per batch, O(events-in-batch) work
    and O(users) state — the state never grows with history, unlike
    k12's full re-replay. Cites k12 (batch twin + oracle) and j06
    (the state-store pattern)."""
    result = stateful_token_bucket(stream_events(spark, sf_dir))
    return materialize(result, output_mode="update")
