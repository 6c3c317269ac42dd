"""§2.A — scans, sources, sinks.

Reference analog: the HDFS file/block model and Hadoop Input/Output
formats (TextInputFormat, SequenceFile, columnar formats via
libraries) — see SURVEY.md §1.1/§2.A. Here every source is a
DataFrame reader with explicit schema; at 100 TB these are
directory-of-files datasets on HDFS/object storage, and the parquet
scans get predicate pushdown + column pruning from Catalyst for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hadoop_release_spark.catalog import table
from hadoop_release_spark.functions.contracts import ts_us
from hadoop_release_spark.plans.registry import register

_LINEITEM_COLS = [
    "l_orderkey",
    "l_partkey",
    "l_suppkey",
    "l_linenumber",
    "l_quantity",
    "l_extendedprice",
    "l_discount",
    "l_tax",
    "l_returnflag",
    "l_linestatus",
]


@register(
    "a01_scan_parquet",
    oracle="""
    SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
           l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
           CAST(epoch_us(l_shipdate) AS BIGINT) AS l_shipdate_us
    FROM lineitem
    """,
    priority="P0",
)
def a01_scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full columnar scan of lineitem (timestamp projected to epoch-µs
    for portable hashing, contract rule 2)."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(*_LINEITEM_COLS, ts_us("l_shipdate").alias("l_shipdate_us"))
