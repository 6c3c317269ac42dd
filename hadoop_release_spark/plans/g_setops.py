"""§2.G — set operations.

Reference analog: multi-input MapReduce jobs (several input paths
into one mapper = bag union; set semantics via a reduce-side
distinct). Spark's union is a zero-shuffle concatenation of
partitions; the *_distinct/intersect/except variants add one
hash-aggregate or hash-join shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_release_spark.catalog import table
from hadoop_release_spark.plans.registry import register


def _sides(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    return s, c


@register(
    "g01_union_all",
    oracle="""
    SELECT s_nationkey AS nationkey FROM supplier
    UNION ALL
    SELECT c_nationkey FROM customer
    """,
)
def g01_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union (no dedup, no shuffle)."""
    s, c = _sides(spark, sf_dir)
    return s.unionAll(c)


@register(
    "g02_union_distinct",
    oracle="""
    SELECT s_nationkey AS nationkey FROM supplier
    UNION
    SELECT c_nationkey FROM customer
    """,
)
def g02_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set union (dedup via one hash-aggregate)."""
    s, c = _sides(spark, sf_dir)
    return s.union(c).distinct()


@register(
    "g03_intersect",
    oracle="""
    SELECT s_nationkey AS nationkey FROM supplier
    INTERSECT
    SELECT c_nationkey FROM customer
    """,
    priority="P2",
)
def g03_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set intersection."""
    s, c = _sides(spark, sf_dir)
    return s.intersect(c)


@register(
    "g04_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
    """,
    priority="P2",
)
def g04_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference: nations with customers but no suppliers."""
    s, c = _sides(spark, sf_dir)
    return c.subtract(s)


@register(
    "g05_intersect_all",
    oracle="""
    SELECT s_nationkey AS nationkey FROM supplier
    INTERSECT ALL
    SELECT c_nationkey FROM customer
    """,
    priority="P2",
)
def g05_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag (multiset) intersection."""
    s, c = _sides(spark, sf_dir)
    return s.intersectAll(c)


@register(
    "g06_except_all",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT ALL
    SELECT s_nationkey FROM supplier
    """,
    priority="P2",
)
def g06_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag (multiset) difference."""
    s, c = _sides(spark, sf_dir)
    return c.exceptAll(s)


@register(
    "g07_union_mismatched",
    oracle="""
    SELECT doc_id, lang, n_chars, NULL AS quality_tier
    FROM documents WHERE doc_id % 2 = 0
    UNION ALL BY NAME
    SELECT doc_id, lang,
           CASE WHEN n_chars > 500 THEN 'long' ELSE 'short' END
             AS quality_tier
    FROM documents WHERE doc_id % 2 = 1
    """,
    priority="P2",
)
def g07_union_mismatched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolving union — concatenating corpus shards produced
    by DIFFERENT pipeline generations (one shard has a column the
    other lacks, in either direction): ``unionByName(
    allowMissingColumns=True)`` aligns by NAME and null-fills, where
    positional UNION (g01) would silently mis-map columns. This is
    the read-side twin of a12's mergeSchema — evolution handled at
    COMBINE time instead of scan time.

    The oracle is DuckDB's ``UNION ALL BY NAME`` — the same
    semantics from an independent implementation.

    Scale shape: zero-shuffle concat exactly like g01; the null fill
    is a per-row projection. At 100 TB this is how heterogeneous
    shard manifests combine without a rewrite pass."""
    d = table(spark, sf_dir, "documents")
    gen_a = d.filter(F.col("doc_id") % 2 == 0).select("doc_id", "lang", "n_chars")
    gen_b = d.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id",
        "lang",
        F.when(F.col("n_chars") > 500, "long").otherwise("short").alias("quality_tier"),
    )
    return gen_a.unionByName(gen_b, allowMissingColumns=True)


@register(
    "g08_coalesce_sources",
    oracle="""
    WITH gen2 AS (
      SELECT o_orderkey,
             CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
               AS price_cents,
             'gen2' AS src, 1 AS rank
      FROM orders WHERE o_orderstatus = 'O'
    ), gen1 AS (
      SELECT o_orderkey,
             CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
               + 100 AS price_cents,
             'gen1' AS src, 2 AS rank
      FROM orders
    ), unioned AS (
      SELECT * FROM gen2 UNION ALL SELECT * FROM gen1
    ), ranked AS (
      SELECT *, row_number() OVER (PARTITION BY o_orderkey
                                   ORDER BY rank) AS rn
      FROM unioned
    )
    SELECT o_orderkey, price_cents, src
    FROM ranked WHERE rn = 1
    """,
    priority="P2",
)
def g08_coalesce_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-precedence merge (ingestion-time record coalescing):
    when the same key arrives from multiple pipeline generations,
    keep the highest-precedence version per key — the batch analog
    of CDC last-writer-wins (e14 compacts by TIME; this coalesces by
    SOURCE RANK, the rule when a fresh partial feed overlays a stale
    full feed). Planted scenario: gen2 re-delivers the open orders
    with fresh prices; gen1 is the stale full snapshot (cents+100);
    open orders must surface gen2, everything else falls back.

    Scale shape: unionByName is a zero-shuffle concat; ONE key
    shuffle drives the precedence window (min-rank per key), the
    same posture as e14. At extreme per-key duplication the window
    degrades to a min_by aggregate — same single shuffle."""
    o = table(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast("long")
    gen2 = o.filter(F.col("o_orderstatus") == "O").select(
        "o_orderkey",
        cents.alias("price_cents"),
        F.lit("gen2").alias("src"),
        F.lit(1).alias("rank"),
    )
    gen1 = o.select(
        "o_orderkey",
        (cents + 100).alias("price_cents"),
        F.lit("gen1").alias("src"),
        F.lit(2).alias("rank"),
    )
    w = Window.partitionBy("o_orderkey").orderBy("rank")
    return (
        gen2.unionByName(gen1)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_orderkey", "price_cents", "src")
    )


@register(
    "g09_symmetric_diff",
    oracle="""
    WITH a AS (
      SELECT o_custkey, CAST(count(*) AS BIGINT) AS n
      FROM orders WHERE year(o_orderdate) = 1996 GROUP BY o_custkey
    ), b AS (
      SELECT o_custkey, CAST(count(*) AS BIGINT) AS n
      FROM orders WHERE year(o_orderdate) = 1997 GROUP BY o_custkey
    )
    SELECT coalesce(a.o_custkey, b.o_custkey) AS o_custkey,
           CASE WHEN b.o_custkey IS NULL THEN 'only_1996'
                ELSE 'only_1997' END AS side,
           coalesce(a.n, b.n) AS n_orders
    FROM a FULL OUTER JOIN b ON a.o_custkey = b.o_custkey
    WHERE a.o_custkey IS NULL OR b.o_custkey IS NULL
    """,
    priority="P2",
)
def g09_symmetric_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed symmetric difference with PROVENANCE: customers who
    ordered in exactly one of 1996/1997, labeled by side, with that
    year's order count — the churn/acquisition split (EXCEPT gives
    one direction and drops the why; this gives both directions and
    a measure in one pass). Both year filters push into the scan;
    each side is a map-side-combined per-customer partial agg, and
    the FULL OUTER join consumes the two aggs ALREADY hash-
    partitioned by customer — Spark reuses the groupBy exchanges,
    so the join itself adds no shuffle. XOR rows are exactly the
    null-sided join rows; the both-years majority never leaves the
    join. At 100 TB: two slim aggregate shuffles of ≤|customers|
    rows each, no sort, no broadcast needed (and none wanted —
    both sides are customer-scale)."""
    o = table(spark, sf_dir, "orders")

    def year_side(yr: int) -> DataFrame:
        return (
            o.filter(F.year("o_orderdate") == yr)
            .groupBy("o_custkey")
            .agg(F.count("*").cast("bigint").alias("n"))
        )

    a = year_side(1996).select(
        F.col("o_custkey").alias("ck_a"), F.col("n").alias("n_a")
    )
    b = year_side(1997).select(
        F.col("o_custkey").alias("ck_b"), F.col("n").alias("n_b")
    )
    j = a.join(b, a.ck_a == b.ck_b, "full_outer").filter(
        F.col("ck_a").isNull() | F.col("ck_b").isNull()
    )
    return j.select(
        F.coalesce("ck_a", "ck_b").alias("o_custkey"),
        F.when(F.col("ck_b").isNull(), F.lit("only_1996"))
        .otherwise(F.lit("only_1997"))
        .alias("side"),
        F.coalesce("n_a", "n_b").alias("n_orders"),
    )


@register(
    "g10_relational_division",
    oracle="""
    WITH divisor AS (
      SELECT CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS n_div
      FROM orders
    ), per_cust AS (
      SELECT o_custkey,
             CAST(count(DISTINCT o_orderpriority) AS BIGINT)
               AS n_priorities,
             CAST(count(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY o_custkey
    )
    SELECT p.o_custkey, p.n_priorities, p.n_orders
    FROM per_cust p CROSS JOIN divisor d
    WHERE p.n_priorities = d.n_div
    """,
    priority="P2",
)
def g10_relational_division(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational DIVISION — the classic "÷" operator the basic set
    family (g01-g09) is missing: customers whose orders span EVERY
    order-priority level observed in the corpus ("suppliers who
    supply ALL parts" is the textbook form). The divisor is
    DATA-DEFINED (the corpus-wide distinct priority set), not a
    literal list — the true division semantics: a new priority
    appearing in the data silently raises the bar. Emits each
    qualifying customer with its distinct-priority and total-order
    counts (all-exact provenance for the threshold).

    Determinism: exact bigint counts end-to-end; no float anywhere;
    the equality gate compares two exact counts.

    Scale shape: ONE (custkey, priority) distinct partial agg (the
    d04 count-distinct posture: map-side combine on the pair grid,
    ≤ |customers|·|priorities| slim rows) feeding per-customer
    counts; the divisor is a 1-row broadcast (granted stats row);
    no raw-row shuffle beyond the single per-customer agg. At
    100 TB: |priorities| is an enum-bounded domain, so the pair
    grid is ~|customers| rows forever."""
    o = table(spark, sf_dir, "orders")
    divisor = o.agg(
        F.countDistinct("o_orderpriority").cast("long").alias("n_div")
    )
    per_cust = o.groupBy("o_custkey").agg(
        F.countDistinct("o_orderpriority").cast("long").alias("n_priorities"),
        F.count("*").cast("long").alias("n_orders"),
    )
    return (
        per_cust.crossJoin(F.broadcast(divisor))
        .filter(F.col("n_priorities") == F.col("n_div"))
        .select("o_custkey", "n_priorities", "n_orders")
    )
