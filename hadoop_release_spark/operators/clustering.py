"""Iterative k-means over embedding columns — the iterative-algorithm
pattern on Spark (Lloyd's algorithm as a driver-side loop of
DataFrame plans).

Each iteration is two distributed steps:
  assign: corpus ⋈ broadcast(centroids) → per-row argmin distance
          (one narrow pass, no corpus shuffle);
  update: groupBy(cluster) of element-wise vector sums → new
          centroids (shuffle carries k×dim doubles per task — tiny).

Only the k centroids (k × dim doubles) ever reach the driver, so the
loop scales to any corpus size; iterations are capped and
deterministic (fixed systematic-sample init, deterministic argmin
tie-break), satisfying the engine's no-runtime-randomness rule.
pyspark.ml.clustering.KMeans offers the same via MLlib; this
implementation keeps the engine dependency-free and the dataflow
explicit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sq_dist(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double")) ** 2),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def kmeans(
    embeddings: DataFrame,
    k: int = 8,
    max_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cluster assignment after ``max_iter`` Lloyd iterations.

    Init: every (n//k)-th vector by id order (deterministic
    systematic sample). Returns (id_col, cluster, sq_dist).
    """
    n = embeddings.count()
    step = max(n // k, 1)
    centroids = [
        (i, [float(x) for x in row[vec_col]])
        for i, row in enumerate(
            embeddings.orderBy(id_col)
            .filter((F.col(id_col) % step == 0) & (F.col(id_col) < step * k))
            .select(vec_col)
            .collect()
        )
    ]

    def assign_expr(cents: list[tuple[int, list[float]]]):
        """(sq_dist, cluster) of the nearest centroid, as ONE narrow
        per-row expression: the k centroids are driver-side constants
        (k × dim doubles), so the argmin needs no crossJoin, no
        window, no shuffle — struct ordering gives the deterministic
        (distance, cluster-id) tie-break. The assign step is thereby
        embarrassingly parallel at any corpus size."""
        candidates = F.array(
            *[
                F.struct(
                    _sq_dist(
                        F.col(vec_col), F.array(*[F.lit(x) for x in c])
                    ).alias("sq_dist"),
                    F.lit(cid).alias("cluster"),
                )
                for cid, c in cents
            ]
        )
        return F.array_min(candidates)

    for _ in range(max_iter):
        # Update step: element-wise mean per cluster via posexplode →
        # (cluster, dim) aggregation → regroup into vectors. The ONLY
        # shuffle per iteration, carrying k×dim partial sums per task.
        dim_means = (
            embeddings.withColumn("cluster", assign_expr(centroids)["cluster"])
            .select("cluster", F.posexplode(F.col(vec_col)).alias("d", "x"))
            .groupBy("cluster", "d")
            .agg(F.avg(F.col("x").cast("double")).alias("m"))
            .groupBy("cluster")
            .agg(F.array_sort(F.collect_list(F.struct("d", "m"))).alias("dm"))
            .select("cluster", F.transform("dm", lambda s: s["m"]).alias("centroid"))
            .collect()
        )
        centroids = [(r.cluster, list(r.centroid)) for r in dim_means]

    best = assign_expr(centroids)
    return embeddings.select(
        F.col(id_col),
        best["cluster"].alias("cluster"),
        F.round(best["sq_dist"], 3).alias("sq_dist"),
    )
