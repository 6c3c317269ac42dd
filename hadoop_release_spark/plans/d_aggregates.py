"""§2.D — aggregations.

Reference analog: the MapReduce Combiner/Reducer model. Spark's
HashAggregateExec plans partial (map-side, the combiner) + final
(post-shuffle, the reducer) automatically — i05 asserts this on the
physical plan. At 100 TB the partial agg collapses each group to one
row per task before the shuffle, which is exactly the combiner win.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_release_spark.catalog import table
from hadoop_release_spark.functions.contracts import davg, dsum, net_price, oavg, osum
from hadoop_release_spark.plans.registry import register


@register(
    "d01_agg_global",
    oracle=f"""
    SELECT count(*) AS n_rows,
           {osum("l_quantity")} AS sum_qty,
           {oavg("l_quantity")} AS avg_qty,
           min(l_quantity) AS min_qty,
           max(l_quantity) AS max_qty,
           {osum("l_extendedprice")} AS sum_price,
           {oavg("l_extendedprice")} AS avg_price,
           count(DISTINCT l_orderkey) AS n_orders
    FROM lineitem
    """,
    priority="P0",
)
def d01_agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ungrouped aggregation over lineitem."""
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n_rows"),
        dsum("l_quantity").alias("sum_qty"),
        davg("l_quantity").alias("avg_qty"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        dsum("l_extendedprice").alias("sum_price"),
        davg("l_extendedprice").alias("avg_price"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


@register(
    "d02_agg_groupby",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {osum("l_quantity")} AS sum_qty,
           {osum("l_extendedprice")} AS sum_base_price,
           {osum("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
           {osum("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
           {oavg("l_quantity")} AS avg_qty,
           {oavg("l_extendedprice")} AS avg_price,
           {oavg("l_discount")} AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    priority="P0",
)
def d02_agg_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: hash aggregation, 2 keys × 8 measures.

    Partial+final HashAggregate means the shuffle carries ≤ (#groups ×
    #tasks) rows regardless of input scale — the combiner idiom.
    """
    li = table(spark, sf_dir, "lineitem")
    charge = net_price() * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(net_price()).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )
