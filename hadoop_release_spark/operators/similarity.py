"""Approximate nearest-neighbor search: the IVF scale path.

Brute-force cosine top-k (plans/l_llm.py l08/l09) is exact and fine
when either side is bounded. When both the corpus AND the query set
scale, IVF (inverted-file) coarse quantization bounds the work:

  build:  pick K centroids (k-means; here a deterministic stand-in),
          assign every vector to its nearest centroid → cluster id.
          One broadcast-join + per-row argmin: no shuffle of the
          corpus beyond the final write, and the assignment is
          incremental for appended data.
  query:  for each query, rank centroids, keep the nprobe nearest,
          search ONLY vectors in those clusters: a broadcast
          semi-join on cluster id replaces the full scan. Work drops
          by ~K/nprobe at the cost of recall (tunable).

At 100 TB the assigned table is written partitioned/bucketed BY
cluster id, so a probe reads only nprobe partitions — partition
pruning does the candidate selection before any compute.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hadoop_release_spark.functions.vectors import cosine


def assign_clusters(embeddings: DataFrame, centroids: DataFrame) -> DataFrame:
    """Add a ``cluster`` column: id of the nearest centroid.

    ``centroids``: (centroid_id, centroid) — small, broadcast.
    Deterministic tie-break on centroid_id.
    """
    sim = cosine(F.col("embedding"), F.col("centroid"))
    w = Window.partitionBy("vec_id").orderBy(F.col("__sim").desc(), F.col("centroid_id"))
    return (
        embeddings.crossJoin(F.broadcast(centroids))
        .withColumn("__sim", sim)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__sim", "__rn", "centroid")
        .withColumnRenamed("centroid_id", "cluster")
    )


def ivf_topk(
    assigned: DataFrame,
    centroids: DataFrame,
    query: DataFrame,
    k: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """Approximate top-k neighbors of each query vector.

    ``assigned``: (vec_id, embedding, cluster); ``query``:
    (query_id, qe). Returns (query_id, vec_id, score) with score =
    cosine rounded 3dp, deterministically tie-broken.
    """
    # Rank centroids per query; keep the nprobe nearest clusters.
    csim = cosine(F.col("qe"), F.col("centroid"))
    wq = Window.partitionBy("query_id").orderBy(F.col("__csim").desc(), F.col("centroid_id"))
    probes = (
        query.crossJoin(F.broadcast(centroids))
        .withColumn("__csim", csim)
        .withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= nprobe)
        .select("query_id", "qe", F.col("centroid_id").alias("cluster"))
    )
    # Candidate generation: corpus ⋈ probes on cluster id — the IVF
    # pruning step (partition pruning at scale, a hash join here).
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("vec_id"))
    return (
        assigned.join(F.broadcast(probes), "cluster")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(cosine(F.col("embedding"), F.col("qe")), 3).alias("score"),
        )
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
