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


@register(
    "f01_sort_multi_nulls",
    oracle="""
    SELECT o_orderkey, prio,
           row_number() OVER (ORDER BY prio NULLS LAST, o_totalprice DESC, o_orderkey) AS rn
    FROM (SELECT o_orderkey, o_totalprice,
                 nullif(o_orderpriority, '3-MEDIUM') AS prio
          FROM orders)
    """,
)
def f01_sort_multi_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with explicit null placement; the global rank is
    emitted so the ordering is visible to the order-insensitive hash."""
    from hadoop_release_spark.operators.rank import global_row_number

    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_totalprice",
        F.nullif(F.col("o_orderpriority"), F.lit("3-MEDIUM")).alias("prio"),
    )
    ranked = global_row_number(
        o,
        [F.col("prio").asc_nulls_last(), F.col("o_totalprice").desc(), F.col("o_orderkey")],
    )
    return ranked.select("o_orderkey", "prio", "rn")


@register(
    "f03_limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10 OFFSET 10
    """,
    priority="P2",
)
def f03_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pagination: rows 11-20 of a deterministic (tie-broken) sort."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .offset(10)
        .limit(10)
    )


@register(
    "f04_total_order_sort",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           row_number() OVER (ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rn
    FROM lineitem
    """,
)
def f04_total_order_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global total-order sort with global numbering — the TeraSort
    idiom. Uses the scalable two-phase ranker (range-partitioned sort
    + per-partition windows + broadcast offsets), NOT a single-
    partition window: see operators/rank.py."""
    from hadoop_release_spark.operators.rank import global_row_number

    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber", "l_shipdate")
    ranked = global_row_number(li, ["l_shipdate", "l_orderkey", "l_linenumber"])
    return ranked.select("l_orderkey", "l_linenumber", "rn")


#: f05 keyset cursor: resume after this key (a real page boundary at
#: sf0.01; any (o_orderkey) value works — the cursor is the contract).
KEYSET_AFTER = 7500
KEYSET_PAGE = 100


@register(
    "f05_keyset_page",
    oracle=f"""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_orderkey > {KEYSET_AFTER}
    ORDER BY o_orderkey
    LIMIT {KEYSET_PAGE}
    """,
    priority="P2",
)
def f05_keyset_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset (cursor) pagination — the scale-correct successor to
    f03's LIMIT/OFFSET: resume from the last seen key with a
    pushed-down `key > cursor` predicate + top-k. OFFSET N costs
    O(N) rows scanned-and-discarded per page (page 10⁶ of a 100 TB
    table reads a billion rows to throw away); the keyset page costs
    O(page) regardless of depth, because the cursor predicate prunes
    at the parquet scan (row-group min/max skip everything below the
    cursor when the table is sorted/clustered by the key) and the
    limit fuses to TakeOrderedAndProject — per-partition heaps, no
    global sort. The cursor must be a unique (tie-broken) sort key,
    which o_orderkey is."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .filter(F.col("o_orderkey") > KEYSET_AFTER)
        .orderBy("o_orderkey")
        .limit(KEYSET_PAGE)
    )
