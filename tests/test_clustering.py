"""k-means determinism and quality (rows-only contract l21)."""

from __future__ import annotations

from hadoop_release_spark.catalog import table
from hadoop_release_spark.operators.clustering import kmeans


def test_kmeans_deterministic(spark, sf_dir):
    e = table(spark, sf_dir, "embeddings")
    a = sorted((r.vec_id, r.cluster) for r in kmeans(e, k=4, max_iter=3).collect())
    b = sorted((r.vec_id, r.cluster) for r in kmeans(e, k=4, max_iter=3).collect())
    assert a == b


def test_kmeans_covers_all_vectors_and_clusters(spark, sf_dir):
    e = table(spark, sf_dir, "embeddings")
    out = kmeans(e, k=4, max_iter=3).collect()
    assert len(out) == e.count()
    assert {r.cluster for r in out} <= set(range(4))
    assert len({r.cluster for r in out}) >= 2  # not everything in one bucket


def test_kmeans_iterations_reduce_inertia(spark, sf_dir):
    e = table(spark, sf_dir, "embeddings")
    inertia1 = sum(r.sq_dist for r in kmeans(e, k=4, max_iter=1).collect())
    inertia4 = sum(r.sq_dist for r in kmeans(e, k=4, max_iter=4).collect())
    assert inertia4 <= inertia1 * 1.001  # Lloyd never increases inertia
