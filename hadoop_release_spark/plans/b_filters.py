"""§2.B — projection, filters, predicates, distinct.

Reference analog: mapper-side record transforms in MapReduce (the
map phase projects/filters each (K,V)). In this engine these are
Catalyst `Project`/`Filter` nodes: pushed into the parquet scan
(PushedFilters + ReadSchema pruning), so at 100 TB a selective
filter reads only matching row groups and referenced columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_release_spark.catalog import table
from hadoop_release_spark.functions.contracts import net_price, r6
from hadoop_release_spark.plans.registry import register


@register(
    "b01_project_columns",
    oracle="""
    SELECT l_orderkey AS ok, l_partkey AS pk, l_suppkey AS sk,
           l_linenumber AS ln
    FROM lineitem
    """,
    priority="P0",
)
def b01_project_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column projection + rename; ReadSchema should shrink to 4 cols."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_orderkey").alias("ok"),
        F.col("l_partkey").alias("pk"),
        F.col("l_suppkey").alias("sk"),
        F.col("l_linenumber").alias("ln"),
    )


@register(
    "b02_project_computed",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS charge
    FROM lineitem
    """,
    priority="P0",
)
def b02_project_computed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Computed column: per-row charge expression. The product of three
    2dp terms has ≤6 true decimals, so round(·,6) is boundary-free and
    cross-engine deterministic (contracts.py FLOAT RULE)."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        r6(net_price() * (1 + F.col("l_tax"))).alias("charge"),
    )


@register(
    "b03_filter_comparison",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
    FROM lineitem WHERE l_quantity > 30
    """,
    priority="P0",
)
def b03_filter_comparison(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single comparison predicate, pushed to the parquet scan."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_quantity") > 30).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"
    )


@register(
    "b10_distinct_rows",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
    priority="P0",
)
def b10_distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate elimination (hash-aggregate on all projected cols)."""
    return table(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


@register(
    "b04_filter_compound",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
    FROM orders
    WHERE (o_orderstatus = 'F' AND o_totalprice > 150000)
       OR (o_orderpriority = '1-URGENT' AND NOT o_totalprice > 50000)
    """,
)
def b04_filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound AND/OR/NOT predicate (BooleanSimplification fodder)."""
    o = table(spark, sf_dir, "orders")
    cond = ((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 150000)) | (
        (F.col("o_orderpriority") == "1-URGENT") & ~(F.col("o_totalprice") > 50000)
    )
    return o.filter(cond).select(
        "o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice"
    )


@register(
    "b05_filter_in",
    oracle="""
    SELECT o_orderkey, o_orderpriority
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    """,
)
def b05_filter_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list predicate."""
    o = table(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")).select(
        "o_orderkey", "o_orderpriority"
    )


@register(
    "b06_filter_between",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_orderdate BETWEEN TIMESTAMP '1998-01-01 00:00:00'
                          AND TIMESTAMP '1998-06-30 00:00:00'
    """,
)
def b06_filter_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range predicate on the order date (row-group pruning at scale)."""
    o = table(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderdate").between(
            F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"),
            F.lit("1998-06-30 00:00:00").cast("timestamp_ntz"),
        )
    ).select("o_orderkey", "o_totalprice")


@register(
    "b07_filter_like",
    oracle="""
    SELECT p_partkey, p_name
    FROM part
    WHERE p_name LIKE '%a%' AND p_name LIKE '_a%'
    """,
)
def b07_filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL LIKE patterns including the single-char wildcard."""
    p = table(spark, sf_dir, "part")
    return p.filter(F.col("p_name").like("%a%") & F.col("p_name").like("_a%")).select(
        "p_partkey", "p_name"
    )


@register(
    "b08_filter_regexp",
    oracle="""
    SELECT doc_id, lang
    FROM documents
    WHERE regexp_matches(text, 'a.{2}e')
    """,
)
def b08_filter_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex predicate (core of the Hadoop `grep` example)."""
    d = table(spark, sf_dir, "documents")
    return d.filter(F.col("text").rlike("a.{2}e")).select("doc_id", "lang")


@register(
    "b09_filter_null_semantics",
    oracle="""
    SELECT count(*) AS n_rows,
           count(CASE WHEN nullif(o_orderstatus, 'P') IS NULL THEN 1 END) AS n_null,
           count(CASE WHEN nullif(o_orderstatus, 'P') IS NOT NULL THEN 1 END) AS n_not_null,
           count(CASE WHEN nullif(o_orderstatus, 'P')
                           IS NOT DISTINCT FROM nullif(o_orderstatus, 'F') THEN 1 END) AS n_nullsafe_eq
    FROM orders
    """,
)
def b09_filter_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued logic: nulls injected via nullif, tested with
    isNull/isNotNull and the null-safe equality operator (<=>)."""
    o = table(spark, sf_dir, "orders")
    a = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    b = F.nullif(F.col("o_orderstatus"), F.lit("F"))
    return o.agg(
        F.count("*").alias("n_rows"),
        F.count(F.when(a.isNull(), 1)).alias("n_null"),
        F.count(F.when(a.isNotNull(), 1)).alias("n_not_null"),
        F.count(F.when(a.eqNullSafe(b), 1)).alias("n_nullsafe_eq"),
    )
