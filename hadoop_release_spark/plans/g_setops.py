"""§2.G — set operations.

Reference analog: multi-input MapReduce jobs (several input paths
into one mapper = bag union; set semantics via a reduce-side
distinct). Spark's union is a zero-shuffle concatenation of
partitions; the *_distinct/intersect/except variants add one
hash-aggregate or hash-join shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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
