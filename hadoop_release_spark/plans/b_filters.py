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
