"""§2.F — sorts, limits, top-k.

Reference analog: Hadoop total-order sort (TeraSort's
TotalOrderPartitioner + sampled split points). Spark's global
``orderBy`` does the same thing automatically: a range-partitioned
shuffle with sampled boundaries. Global top-k compiles to
``TakeOrderedAndProjectExec`` — per-partition heaps then a k-way
driver merge, no full sort, which is the scalable plan at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
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


@register(
    "f06_skyline",
    oracle="""
    WITH pts AS (
      SELECT o_orderkey,
             CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
               AS cents,
             CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
               AS d_days
      FROM orders
    ), g AS (
      SELECT cents, CAST(max(d_days) AS BIGINT) AS dmax
      FROM pts GROUP BY cents
    ), m AS (
      SELECT cents, dmax,
             max(dmax) OVER (ORDER BY cents
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING) AS mlt
      FROM g
    )
    SELECT p.o_orderkey, p.cents, p.d_days
    FROM pts p JOIN m ON p.cents = m.cents
    WHERE (m.mlt IS NULL OR p.d_days > m.mlt) AND p.d_days = m.dmax
    """,
    priority="P2",
)
def f06_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto frontier) query — Börzsönyi et al. 2001, the
    multi-criteria shortlist: orders minimizing price while
    maximizing recency; a point survives iff NO other order is both
    ≤ price and ≥ date with one strict. The sort-based
    characterization makes it declarative: p is on the skyline iff
    its date (a) exceeds the exclusive prefix-max of dates over all
    strictly cheaper price levels, and (b) equals the max date at
    its own price level (ties at identical (price, date) all
    survive — neither dominates). Exact integers (cents, epoch
    days) — no float rule.

    Scale shape: distinct-price compression first (one map-side
    combined agg to |price levels| rows), then ONE two-phase
    range-partitioned prefix-MAX pass (operators/rank.py
    global_prefix_max — never a partition-less running window); the
    level stats join back on cents (broadcastable when price levels
    are compact). The fact table shuffles once, to its price level —
    the 2-D skyline at 100 TB in two narrow passes."""
    from hadoop_release_spark.operators.rank import global_prefix_max

    o = table(spark, sf_dir, "orders")
    pts = o.select(
        "o_orderkey",
        F.expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)").alias(
            "cents"
        ),
        F.unix_date(F.col("o_orderdate").cast("date")).cast("long").alias(
            "d_days"
        ),
    )
    g = pts.groupBy("cents").agg(F.max("d_days").cast("long").alias("dmax"))
    m = global_prefix_max(g, ["cents"], "dmax", "mlt")
    return (
        pts.join(m, "cents")
        .filter(
            (F.col("mlt").isNull() | (F.col("d_days") > F.col("mlt")))
            & (F.col("d_days") == F.col("dmax"))
        )
        .select("o_orderkey", "cents", "d_days")
    )


@register(
    "f07_diversified_topk",
    oracle="""
    WITH ranked AS (
      SELECT o_orderkey, o_custkey, o_totalprice,
             CAST(row_number() OVER (PARTITION BY o_custkey
                                     ORDER BY o_totalprice DESC,
                                              o_orderkey)
                  AS BIGINT) AS per_cust_rank
      FROM orders
      QUALIFY per_cust_rank <= 2
    ), top AS (
      SELECT * FROM ranked
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 20
    )
    SELECT CAST(row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey)
                AS BIGINT) AS pos,
           o_orderkey, o_custkey, o_totalprice, per_cust_rank
    FROM top
    """,
    priority="P2",
)
def f07_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversified global top-k: the 20 highest-value orders subject
    to AT MOST 2 PER CUSTOMER — the result-diversity constraint of
    search/reco serving (a plain top-k can be one whale customer;
    this one can't). Two-stage plan: a per-customer row_number
    window (hash-partitioned by customer — fully parallel, no
    global sort) keeps each customer's best 2, then a global top-20
    over the survivors compiles to TakeOrderedAndProject (per-
    partition heaps + driver k-way merge, O(k) memory — the f02
    shape). Spark's WindowGroupLimit pushes the rn ≤ 2 filter into
    the window sort, so no customer's full order list materializes.
    All ties break by order key (contract rule 4); the global
    position is emitted over the final 20 rows (single tiny
    partition — post-limit, not a scale concern).

    At 100 TB the survivor set is ≤ 2·|customers| slim rows — the
    diversity filter is also the shuffle reducer."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    w_cust = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    survivors = (
        o.withColumn(
            "per_cust_rank", F.row_number().over(w_cust).cast("long")
        )
        .filter(F.col("per_cust_rank") <= 2)
    )
    top = survivors.orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    ).limit(20)
    w_pos = Window.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return top.select(
        F.row_number().over(w_pos).cast("long").alias("pos"),
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        "per_cust_rank",
    )
