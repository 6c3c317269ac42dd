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


def global_prefix_sum(
    df: DataFrame, order_cols: list, value_col: str, out_name: str = "cum_before"
) -> DataFrame:
    """Append the EXCLUSIVE global prefix sum of ``value_col`` (long)
    in the total order of ``order_cols`` (must be a total order).

    Same two-phase shape as :func:`global_row_number` — a naive
    ``sum() OVER (ORDER BY …)`` with no PARTITION BY collapses to one
    partition. Here: range-partition by the order keys, per-partition
    running sum (parallel window), then per-partition totals → a
    #partitions-sized offset list broadcast back. The persist is
    load-bearing for the same sampling reason as global_row_number."""
    n_part = max(df.sparkSession.sparkContext.defaultParallelism, 2)
    parted = df.repartitionByRange(n_part, *order_cols).withColumn(
        _PID, F.spark_partition_id()
    )
    parted = parted.persist()

    totals = (
        parted.groupBy(_PID)
        .agg(F.sum(F.col(value_col).cast("long")).alias("__psum"))
        .orderBy(_PID)
        .collect()
    )
    rows, acc = [], 0
    for row in totals:
        rows.append((row[_PID], acc))
        acc += row["__psum"] or 0
    offset_df = df.sparkSession.createDataFrame(
        rows, f"{_PID} int, __sum_offset long"
    )

    w = (
        Window.partitionBy(_PID)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        parted.withColumn("__incl", F.sum(F.col(value_col).cast("long")).over(w))
        .join(F.broadcast(offset_df), _PID)
        .withColumn(
            out_name,
            (F.col("__incl") - F.col(value_col) + F.col("__sum_offset")).cast("long"),
        )
        .drop(_PID, "__incl", "__sum_offset")
    )


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
