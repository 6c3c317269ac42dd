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


def test_kmeans_inertia_monotone_nonincreasing(spark, sf_dir):
    """Lloyd's algorithm never increases inertia: assert the FULL
    trajectory (every consecutive iteration pair), not just the
    endpoints — a bug that oscillates mid-run would pass an
    endpoint-only check."""
    e = table(spark, sf_dir, "embeddings")
    inertias = [
        sum(r.sq_dist for r in kmeans(e, k=4, max_iter=i).collect())
        for i in range(1, 5)
    ]
    for prev, cur in zip(inertias, inertias[1:]):
        # 1e-3 relative slack: sq_dist is rounded to 3 decimals in the
        # operator's output contract
        assert cur <= prev * (1 + 1e-3), inertias
