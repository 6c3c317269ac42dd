"""Scalable global total-order ranking (TeraSort numbering analog).

``row_number() OVER (ORDER BY …)`` with no PARTITION BY collapses to
a single partition — fine at test scale, fatal at 100 TB. This
operator produces the identical numbering scalably:

  1. range-partition + sort by the keys (Spark's TotalOrderPartitioner
     analog: sampled range boundaries),
  2. per-partition row_number (a partitioned window — parallel),
  3. per-partition counts → cumulative offsets (one tiny driver-side
     list, #partitions entries) joined back via broadcast.

As long as the sort keys are a total order (unique), the numbering is
deterministic regardless of where range boundaries fall.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_PID = "__rank_pid"


def global_prefix_sums(
    df: DataFrame, order_cols: list, value_cols: list, out_names: list
) -> DataFrame:
    """Append the EXCLUSIVE global prefix sums of each ``value_cols``
    (long) in the total order of ``order_cols`` (must be a total
    order) — k running totals for the price of ONE pass.

    Same two-phase shape as :func:`global_row_number` — a naive
    ``sum() OVER (ORDER BY …)`` with no PARTITION BY collapses to one
    partition. Here: range-partition by the order keys ONCE,
    per-partition running sums for ALL k columns in one parallel
    window, then one per-partition-totals collect (#partitions × k
    longs) broadcast back. Callers needing several cumulative series
    over the same order (d32's two ECDFs) must use this instead of
    stacking single-column passes: the sampling pass, persist, and
    sort are the cost, and they amortize across columns. The persist
    is load-bearing for the same sampling reason as
    global_row_number."""
    if not value_cols or len(value_cols) != len(out_names):
        raise ValueError(
            "global_prefix_sums: value_cols must be non-empty and the same "
            f"length as out_names (got {len(value_cols)} value_cols, "
            f"{len(out_names)} out_names)"
        )
    n_part = max(df.sparkSession.sparkContext.defaultParallelism, 2)
    parted = df.repartitionByRange(n_part, *order_cols).withColumn(
        _PID, F.spark_partition_id()
    )
    parted = parted.persist()

    totals = (
        parted.groupBy(_PID)
        .agg(
            *[
                F.sum(F.col(c).cast("long")).alias(f"__psum_{i}")
                for i, c in enumerate(value_cols)
            ]
        )
        .orderBy(_PID)
        .collect()
    )
    rows, acc = [], [0] * len(value_cols)
    for row in totals:
        rows.append((row[_PID], *acc))
        for i in range(len(value_cols)):
            acc[i] += row[f"__psum_{i}"] or 0
    off_schema = f"{_PID} int, " + ", ".join(
        f"__sum_offset_{i} long" for i in range(len(value_cols))
    )
    offset_df = df.sparkSession.createDataFrame(rows, off_schema)

    w = (
        Window.partitionBy(_PID)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = parted
    for i, c in enumerate(value_cols):
        out = out.withColumn(f"__incl_{i}", F.sum(F.col(c).cast("long")).over(w))
    out = out.join(F.broadcast(offset_df), _PID)
    for i, (c, name) in enumerate(zip(value_cols, out_names)):
        out = out.withColumn(
            name,
            (F.col(f"__incl_{i}") - F.col(c) + F.col(f"__sum_offset_{i}")).cast(
                "long"
            ),
        )
    drops = [_PID] + [f"__incl_{i}" for i in range(len(value_cols))] + [
        f"__sum_offset_{i}" for i in range(len(value_cols))
    ]
    return out.drop(*drops)


def global_prefix_sum(
    df: DataFrame, order_cols: list, value_col: str, out_name: str = "cum_before"
) -> DataFrame:
    """Single-column form of :func:`global_prefix_sums`."""
    return global_prefix_sums(df, order_cols, [value_col], [out_name])


def global_row_number(df: DataFrame, cols: list, rn_name: str = "rn") -> DataFrame:
    """Append 1-based global rank by `cols` (must be a total order)."""
    n_part = max(df.sparkSession.sparkContext.defaultParallelism, 2)
    parted = df.repartitionByRange(n_part, *cols).withColumn(_PID, F.spark_partition_id())
    # Persist before the two downstream jobs (count + rank): the range
    # partitioner SAMPLES to pick boundaries, so re-executing the
    # lineage in each job could yield different partitionings and
    # corrupt the offsets. The same holds at cluster scale — stage
    # materialization is inherent to total-order numbering (TeraSort
    # also does a dedicated sampling pass over stable input).
    parted = parted.persist()

    counts = parted.groupBy(_PID).count().orderBy(_PID).collect()
    offsets, acc = {}, 0
    for row in counts:
        offsets[row[_PID]] = acc
        acc += row["count"]
    offset_df = df.sparkSession.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], f"{_PID} int, __rank_offset long"
    )

    w = Window.partitionBy(_PID).orderBy(*cols)
    return (
        parted.withColumn("__local_rn", F.row_number().over(w))
        .join(F.broadcast(offset_df), _PID)
        .withColumn(rn_name, (F.col("__local_rn") + F.col("__rank_offset")).cast("long"))
        .drop(_PID, "__local_rn", "__rank_offset")
    )


def global_prefix_max(
    df: DataFrame, order_cols: list, value_col: str, out_name: str = "max_before"
) -> DataFrame:
    """Append the EXCLUSIVE global prefix MAX of ``value_col`` (long)
    in the total order of ``order_cols`` — null where no prior row
    exists. Same two-phase shape as :func:`global_prefix_sums` (a
    bare ``max() OVER (ORDER BY …)`` collapses to one partition):
    range-partition once, per-partition exclusive running max in a
    parallel window, then per-partition maxes (#partitions longs)
    collect into exclusive cross-partition offsets broadcast back.
    The persist is load-bearing for the same sampling reason as
    global_row_number."""
    n_part = max(df.sparkSession.sparkContext.defaultParallelism, 2)
    parted = df.repartitionByRange(n_part, *order_cols).withColumn(
        _PID, F.spark_partition_id()
    )
    parted = parted.persist()

    totals = (
        parted.groupBy(_PID)
        .agg(F.max(F.col(value_col).cast("long")).alias("__pmax"))
        .orderBy(_PID)
        .collect()
    )
    rows, acc = [], None
    for row in totals:
        rows.append((row[_PID], acc))
        v = row["__pmax"]
        if v is not None:
            acc = v if acc is None else max(acc, v)
    offset_df = df.sparkSession.createDataFrame(
        rows, f"{_PID} int, __max_offset long"
    )

    w = (
        Window.partitionBy(_PID)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = (
        parted.withColumn(
            "__local_excl", F.max(F.col(value_col).cast("long")).over(w)
        )
        .join(F.broadcast(offset_df), _PID)
        .withColumn(
            out_name,
            F.when(
                F.col("__local_excl").isNull(), F.col("__max_offset")
            ).when(
                F.col("__max_offset").isNull(), F.col("__local_excl")
            ).otherwise(
                F.greatest(F.col("__local_excl"), F.col("__max_offset"))
            ),
        )
    )
    return out.drop(_PID, "__local_excl", "__max_offset")


def global_kth(
    df: DataFrame, order_cols: list, target_of_total
) -> DataFrame:
    """Return the single row at global rank k (1-based) in the total
    order of ``order_cols`` — distributed SELECTION without numbering
    every row.

    ``target_of_total(total_rows) -> k`` computes the wanted rank
    from the global count (e.g. the lower median
    ``lambda t: (t + 1) // 2``). Two-phase TeraSort shape:
    range-partition by the order keys ONCE, collect per-partition
    COUNTS (#partitions longs — O(partitions), never O(data)),
    locate the one partition containing rank k, and row_number ONLY
    inside it. Versus :func:`global_row_number` this skips the
    numbering window over every partition and the offsets join —
    the other partitions are never sorted. The persist is
    load-bearing for the same sampling reason as global_row_number.
    Ties in ``order_cols`` are fine when only the VALUE at rank k is
    consumed: any stable order among equal keys selects an equal
    value. Returns an empty frame when df is empty.

    Stale-cache guard (advisor finding, round 7): if a persisted
    block were evicted between the counts collect and the final
    action, the recompute re-executes the SAME RDD lineage (same RDD
    id → same range-partitioner sample seed → identical boundaries
    for deterministic input), so drift needs nondeterministic input —
    but belt-and-braces, the returned plan re-counts the selected
    partition inside the same window sort and yields ZERO rows
    instead of a plausible-but-wrong value if the partition's
    contents no longer match the collected count. (localCheckpoint
    was evaluated and rejected: it drops outputPartitioning, adding
    one full-data hash exchange per downstream window — measured in
    the e29 plan.)"""
    n_part = max(df.sparkSession.sparkContext.defaultParallelism, 2)
    parted = df.repartitionByRange(n_part, *order_cols).withColumn(
        _PID, F.spark_partition_id()
    )
    parted = parted.persist()

    counts = parted.groupBy(_PID).count().orderBy(_PID).collect()
    total = sum(r["count"] for r in counts)
    if total == 0:
        return parted.drop(_PID).limit(0)
    k = int(target_of_total(total))
    if not 1 <= k <= total:
        raise ValueError(f"global_kth: rank {k} outside [1, {total}]")
    acc, pid, local_k = 0, None, None
    for r in counts:
        if acc + r["count"] >= k:
            pid, local_k = r[_PID], k - acc
            break
        acc += r["count"]

    expected = next(r["count"] for r in counts if r[_PID] == pid)
    w = Window.partitionBy(_PID).orderBy(*order_cols)
    return (
        parted.filter(F.col(_PID) == pid)
        .withColumn("__local_rn", F.row_number().over(w))
        .withColumn("__pcount", F.count("*").over(Window.partitionBy(_PID)))
        .filter(
            (F.col("__local_rn") == local_k)
            & (F.col("__pcount") == F.lit(expected))
        )
        .drop(_PID, "__local_rn", "__pcount")
    )
