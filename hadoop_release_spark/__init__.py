"""hadoop_release_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first engine providing the query and
data-processing capability surface of the reference
``kiabu/hadoop-release`` (an Apache Hadoop release distribution —
see ``/root/reference/README.md:1-4`` and ``SURVEY.md §0``): the
HDFS/MapReduce operator idioms re-expressed as Catalyst-optimized
DataFrame plans, plus the LLM-data-pipeline operators (dedup,
similarity search, multimodal columns, text analysis) required by
the north star, all designed for 100 TB scale.

Layout:
    session.py    — SparkSession builder with contract-safety configs
    catalog.py    — fixture table loader (single point of ts normalization)
    plans/        — the query contract (SURVEY.md §2 rows) + registry
    operators/    — reusable composite operators (as-of join, top-k,
                    sessionize, dedup, similarity join)
    functions/    — scalar/vector/text helper expressions
    sources/      — format round-trips and partitioned sinks
    streaming/    — Structured Streaming runners (availableNow bridge)
"""

from hadoop_release_spark.session import get_session  # noqa: F401

__version__ = "0.1.0"
