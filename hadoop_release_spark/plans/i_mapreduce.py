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
from hadoop_release_spark.functions.contracts import dsum, net_price, osum
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


@register(
    "i02_mr_grep",
    oracle="""
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(len(regexp_extract_all(text, 'th[a-z]+'))) AS BIGINT) AS n_matches
    FROM documents
    WHERE regexp_matches(text, 'th[a-z]+')
    GROUP BY lang
    """,
)
def i02_mr_grep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """grep — the Hadoop example: count regex matches per group.
    map = regexp filter+count, reduce = sum."""
    docs = table(spark, sf_dir, "documents")
    pat = "th[a-z]+"
    return (
        docs.filter(F.col("text").rlike(pat))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.regexp_count(F.col("text"), F.lit(pat))).cast("long").alias("n_matches"),
        )
    )


@register(
    "i03_mr_secondary_sort",
    oracle="""
    SELECT event_id, user_id,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seq
    FROM events
    """,
)
def i03_mr_secondary_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Secondary sort — values time-ordered within each reduce group.

    The raw MapReduce idiom is repartition(user_id) +
    sortWithinPartitions(user_id, ts): one shuffle, values arrive
    ordered per key. The contract output uses the equivalent window
    (same shuffle + sort in the physical plan) so the sequence is a
    hashable column.
    """
    ev = table(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select("event_id", "user_id", F.row_number().over(w).alias("seq"))


@register(
    "i04_mr_partitioner",
    oracle="SELECT c_custkey, c_nationkey FROM customer",
    priority="P2",
)
def i04_mr_partitioner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom partitioner: hash-repartition by nation key, then an
    identity projection — partitioning must never change the row
    multiset (Hadoop's Partitioner contract)."""
    c = table(spark, sf_dir, "customer")
    return c.repartition(8, "c_nationkey").select("c_custkey", "c_nationkey")


@register(
    "i05_mr_combiner",
    oracle=f"""
    SELECT l_suppkey, count(*) AS n, {osum("l_quantity")} AS sum_qty
    FROM lineitem GROUP BY l_suppkey
    """,
)
def i05_mr_combiner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Combiner equivalence: Spark always plans partial (map-side)
    + final (reduce-side) HashAggregate — Hadoop's combiner, but
    automatic. tests/test_plans.py asserts the two-phase shape on
    the physical plan."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_suppkey").agg(
        F.count("*").alias("n"), dsum("l_quantity").alias("sum_qty")
    )


@register(
    "i06_mr_distcache_join",
    oracle=f"""
    SELECT r_name, count(*) AS n_items,
           {osum("l_extendedprice * (1 - l_discount)")} AS revenue
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def i06_mr_distcache_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed-cache join: every dim (supplier/nation/region) is
    bounded, so all three broadcast — zero shuffles on the fact table
    until the final aggregation."""
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_items"),
            dsum(net_price()).alias("revenue"),
        )
    )


@register(
    "i07_mr_counters",
    oracle="""
    SELECT count(*) AS n_total,
           count(CASE WHEN l_returnflag = 'R' THEN 1 END) AS n_returned,
           count(CASE WHEN l_quantity > 40 THEN 1 END) AS n_bulk,
           count(CASE WHEN l_discount > 0.08 THEN 1 END) AS n_deep_discount
    FROM lineitem
    """,
    priority="P2",
)
def i07_mr_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Job counters: per-condition record counts emitted as one row.
    (SparkContext accumulators exist for side-channel counting, but
    conditional aggregation is the dataflow-native form.)"""
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n_total"),
        F.count(F.when(F.col("l_returnflag") == "R", 1)).alias("n_returned"),
        F.count(F.when(F.col("l_quantity") > 40, 1)).alias("n_bulk"),
        F.count(F.when(F.col("l_discount") > 0.08, 1)).alias("n_deep_discount"),
    )


@register(
    "i08_mr_distcp",
    oracle="SELECT * FROM region",
    priority="P2",
)
def i08_mr_distcp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DistCp — fault-tolerant bulk copy: copy the region dataset
    tree, re-read the copy, verify the identical multiset. Locally a
    filesystem copy; on a cluster the same operation is a
    distributed per-file copy job over file listings."""
    import shutil

    from hadoop_release_spark.sources.roundtrip import scratch_dir

    dest = scratch_dir("i08distcp") + "/region.parquet"
    shutil.copy(f"{sf_dir}/region.parquet", dest)
    return spark.read.parquet(dest)
