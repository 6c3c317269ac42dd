"""§2.C — joins.

Reference analog: Hadoop reduce-side join (shuffle both inputs on
the key = Spark sort-merge/shuffled-hash join) and map-side join
(small table in the DistributedCache = Spark broadcast-hash join).
Scale posture: only bounded dims (region=5, nation=25) are broadcast
unconditionally; fact-fact joins shuffle on their keys and rely on
AQE for skew splitting and runtime join-strategy switches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_release_spark.catalog import table
from hadoop_release_spark.functions.contracts import dsum, net_price, osum
from hadoop_release_spark.plans.registry import register


@register(
    "c01_join_inner",
    oracle="""
    SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
    FROM orders JOIN customer ON o_custkey = c_custkey
    """,
    priority="P0",
)
def c01_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join (Hadoop reduce-side join analog): both sides
    shuffle on the key at scale; AQE may switch to broadcast when the
    build side is small."""
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    return orders.join(customer, orders.o_custkey == customer.c_custkey, "inner").select(
        "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"
    )


@register(
    "c13_join_star",
    oracle=f"""
    SELECT n_name,
           {osum("l_extendedprice * (1 - l_discount)")} AS revenue,
           count(*) AS n_lineitems
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE o_orderdate >= TIMESTAMP '1998-01-01'
      AND o_orderdate <  TIMESTAMP '1999-01-01'
    GROUP BY n_name
    """,
    priority="P1",
)
def c13_join_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way star join (TPC-H Q5 shape): revenue per nation for one
    order year.

    Scale plan: lineitem⋈orders⋈customer are key-shuffled fact joins
    (AQE-managed); nation and region are bounded dims and explicitly
    broadcast (Hadoop distributed-cache idiom). The date filter is
    pushed to the orders scan, shrinking the first shuffle.
    """
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp_ntz"))
    )
    lineitem = table(spark, sf_dir, "lineitem")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            dsum(net_price()).alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
    )
