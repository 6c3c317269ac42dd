"""§2.F — sorts, limits, top-k.

Reference analog: Hadoop total-order sort (TeraSort's
TotalOrderPartitioner + sampled split points). Spark's global
``orderBy`` does the same thing automatically: a range-partitioned
shuffle with sampled boundaries. Global top-k compiles to
``TakeOrderedAndProjectExec`` — per-partition heaps then a k-way
driver merge, no full sort, which is the scalable plan at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_release_spark.catalog import table
from hadoop_release_spark.plans.registry import register


@register(
    "f02_topk_global",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderstatus
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    priority="P0",
)
def f02_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 orders by price (tie-broken by key, contract
    rule 4). Plan: TakeOrderedAndProject — O(k) memory per partition."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_totalprice", "o_orderstatus")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )
