"""§2.I — the MapReduce canonical programs.

These are the reference's own flagship computations: every Apache
Hadoop release ships them in ``hadoop-mapreduce-examples`` (public
surface implied by /root/reference/README.md:4 — the repo itself has
no code, SURVEY.md §0). Re-expressed as DataFrame plans, each one's
hand-built MapReduce machinery maps to a Catalyst physical feature.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_release_spark.catalog import table
from hadoop_release_spark.plans.registry import register


@register(
    "i01_mr_wordcount",
    oracle="""
    SELECT token, count(*) AS cnt
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    WHERE token <> ''
    GROUP BY token
    """,
    priority="P0",
)
def i01_mr_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """wordcount — THE canonical MapReduce program.

    map = explode(split), combine+reduce = partial/final
    HashAggregate. The map-side partial agg is exactly Hadoop's
    combiner: the shuffle carries one row per (task, token), not one
    per word occurrence — the difference between shuffling ~vocab-size
    and shuffling the whole corpus at 100 TB.
    """
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )
