"""Driver program for scripts/yarn_smoke.sh — runs a comma-separated
list of registry queries against a cluster-visible sf directory and
prints row counts. Kept free of local-filesystem assumptions: the
engine's paths are plain strings, so hdfs:/, s3a:/, and gs:/ all work
unchanged."""
import sys

from pyspark.sql import SparkSession


def main() -> None:
    data_dir, names_csv = sys.argv[1], sys.argv[2]
    spark = SparkSession.builder.appName(
        "hadoop-release-spark-smoke"
    ).getOrCreate()
    from hadoop_release_spark.plans.registry import specs

    for name in names_csv.split(","):
        n = specs()[name].fn(spark, data_dir).count()
        print(f"SMOKE {name}: {n} rows")
    spark.stop()


if __name__ == "__main__":
    main()
