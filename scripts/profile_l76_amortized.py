"""l76 amortized-query-path profile (round 12).

l76's production claim is AMORTIZATION: the cluster-bucketed index is
staged at INGEST, so a repeated / incremental self-kNN workload pays
only the query path — bucketed read → co-located cogroup scoring →
top-k window. The registered op (and the rehearsal row) times the
whole thing end-to-end, ingest included, because the driver grades
one-shot runs; THIS profile separates the two phases the way a
production deployment experiences them:

  ingest  = rank_clusters_arrow (the N·√N assignment kernel) +
            bucketed write — paid once per corpus (re-paid only for
            appended vectors)
  query   = everything after the bucketed read — paid per run

Three timed query reps per scale on the staged index, one shared
session (the jitter protocol); writes L76_AMORTIZED.json.

Usage: python scripts/profile_l76_amortized.py
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from hadoop_release_spark.catalog import table  # noqa: E402
from hadoop_release_spark.operators.similarity import (  # noqa: E402
    rank_clusters_arrow,
    score_candidates_arrow,
    systematic_centroids,
)
from hadoop_release_spark.session import get_session  # noqa: E402
from hadoop_release_spark.sources.roundtrip import fixed_scratch_dir  # noqa: E402

K, NPROBE, DIM, BUCKETS = 5, 4, 64, 32


def main() -> None:
    spark = get_session("l76-amortized-profile")
    out: dict[str, dict[str, float]] = {}
    for sf in ("sf1", "sf10"):
        sf_dir = str(REPO / ".localdata" / sf)
        if not (Path(sf_dir) / "embeddings.parquet").exists():
            print(f"skipping {sf}: run scripts/gen_sf.py first")
            continue
        e = table(spark, sf_dir, "embeddings")
        centroids = systematic_centroids(e)
        ranked = rank_clusters_arrow(
            e, centroids, NPROBE, DIM, pack_vectors=True
        )
        base = fixed_scratch_dir("l76amortized", sf_dir)
        t0 = time.perf_counter()
        (
            ranked.write.bucketBy(BUCKETS, "cluster")
            .option("path", f"{base}/ranked")
            .mode("overwrite")
            .saveAsTable("l76_amortized_idx")
        )
        ingest = time.perf_counter() - t0
        idx = spark.table("l76_amortized_idx")
        reps = []
        for _ in range(3):
            assigned = idx.filter(F.col("__rn") == 1).select(
                "cluster", "vec_id", "embedding", "__nrm"
            )
            probes = idx.select(
                "cluster",
                F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("qe"),
                F.col("__nrm").alias("__qnrm"),
            )
            cand = score_candidates_arrow(
                assigned, probes, K, DIM, packed=True
            )
            w = Window.partitionBy("query_id").orderBy(
                F.col("score").desc(), F.col("vec_id")
            )
            q = (
                cand.select(
                    "query_id",
                    "vec_id",
                    F.round(F.col("__raw"), 3).alias("score"),
                )
                .withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") <= K)
                .drop("__rn")
            )
            t0 = time.perf_counter()
            q.toPandas()
            reps.append(round(time.perf_counter() - t0, 3))
        out[sf] = {
            "ingest_sec": round(ingest, 3),
            "query_reps_sec": reps,
            "query_median_sec": round(statistics.median(reps), 3),
            "query_min_sec": round(min(reps), 3),
        }
        print(sf, out[sf], flush=True)
    ratio = None
    if "sf1" in out and "sf10" in out and out["sf1"]["query_min_sec"]:
        ratio = round(
            out["sf10"]["query_min_sec"] / out["sf1"]["query_min_sec"], 2
        )
    report = {
        "metric": "l76_amortized_query_path",
        "generator": "scripts/gen_sf.py seed=42",
        "note": (
            "ingest is paid once per corpus (assignment kernel + "
            "bucketed write); query is the per-run cost on the "
            "staged index. query_decade_ratio_min compares min "
            "query-path walls sf1 -> sf10."
        ),
        "query_decade_ratio_min": ratio,
        "scales": out,
    }
    (REPO / "L76_AMORTIZED.json").write_text(json.dumps(report, indent=1))
    print("wrote L76_AMORTIZED.json")


if __name__ == "__main__":
    main()
