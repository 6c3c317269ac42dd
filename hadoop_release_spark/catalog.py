"""Fixture catalog: the single place tables are loaded and normalized.

Tables (TESTDATA.md / FIXTURES.md): region nation customer supplier
part orders lineitem events documents embeddings — one parquet file
per table under the scale-factor directory.

Normalization performed here and nowhere else:
  * ``events.ts`` arrives as bigint nanoseconds (read via
    ``spark.sql.legacy.parquet.nanosAsLong=true``). We expose
      - ``ts``    — timestamp at microsecond precision
                    (``timestamp_micros(ts div 1000)``; integer
                    division = truncation, matching DuckDB's
                    ``CAST(ts_ns AS TIMESTAMP)``)
      - ``ts_ns`` — the raw int64 nanoseconds, for exact arithmetic.

At 100 TB these tables are directories of many parquet files
(possibly hive-partitioned); ``spark.read.parquet`` handles both
shapes identically, so nothing here assumes single-file inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_release_spark.session import ensure_configs

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Small dimension tables that are always broadcast-safe, at any
#: scale factor (bounded domains: 5 regions, 25 nations).
BROADCAST_DIMS: frozenset[str] = frozenset({"region", "nation"})


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table with contract normalization applied."""
    ensure_configs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = df.withColumn("ts_ns", F.col("ts")).withColumn(
            "ts", F.expr("timestamp_micros(ts div 1000)")
        )
    return df


def load(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every fixture table. DataFrames are lazy, so this is cheap."""
    return {name: table(spark, sf_dir, name) for name in TABLES}
