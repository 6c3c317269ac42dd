"""l76 incremental-append ingest profile (round 13).

append_to_bucketed_index's production claim is that a nightly delta
pays ONLY its own assignment + a bucket-appended write — never the
standing corpus's. This profile measures that claim at gen_sf scale:
for each scale, time (a) one-shot FULL ingest of all N vectors, then
(b) base ingest of the ~90% split and (c) delta append of the ~10%
split (vec_id % 10 == 0, the same planted split the parity pytest
pins), all through the SHIPPED plan helpers (ingest_bucketed_index /
append_to_bucketed_index), and record append/full. Centroids are the
full-corpus quantizer, frozen across all three runs — the standing-
index contract (appends never refresh the quantizer), and what makes
base+delta row-for-row == full (pinned in tests/test_similarity.py;
re-checked here by row counts).

Expected shape: append wall ≈ delta_fraction × full wall + the fixed
write/session floor — LINEAR IN THE DELTA, independent of corpus
size, which is the whole point (at 100 TB the corpus term dominates
a re-ingest by 10-100×).

Usage: python scripts/profile_l76_append.py
Writes L76_APPEND.json at the repo root.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from hadoop_release_spark.catalog import table  # noqa: E402
from hadoop_release_spark.operators.similarity import (  # noqa: E402
    systematic_centroids,
)
from hadoop_release_spark.plans.l_llm_ext import (  # noqa: E402
    append_to_bucketed_index,
    ingest_bucketed_index,
)
from hadoop_release_spark.session import get_session  # noqa: E402


def main() -> None:
    spark = get_session("l76-append-profile")
    out: dict[str, dict[str, float]] = {}
    for sf in ("sf1", "sf10"):
        sf_dir = str(REPO / ".localdata" / sf)
        if not (Path(sf_dir) / "embeddings.parquet").exists():
            print(f"skipping {sf}: run scripts/gen_sf.py first")
            continue
        e = table(spark, sf_dir, "embeddings")
        centroids = systematic_centroids(e)
        base = e.filter(F.col("vec_id") % 10 != 0)
        delta = e.filter(F.col("vec_id") % 10 == 0)
        n_total, n_delta = e.count(), delta.count()

        t0 = time.perf_counter()
        full_idx = ingest_bucketed_index(
            spark, e, centroids, f"{sf_dir}#append-profile-full"
        )
        full_sec = time.perf_counter() - t0
        full_rows = full_idx.count()

        t0 = time.perf_counter()
        ingest_bucketed_index(
            spark, base, centroids, f"{sf_dir}#append-profile-incr"
        )
        base_sec = time.perf_counter() - t0

        t0 = time.perf_counter()
        grown = append_to_bucketed_index(
            spark, delta, centroids, f"{sf_dir}#append-profile-incr"
        )
        append_sec = time.perf_counter() - t0
        grown_rows = grown.count()
        assert grown_rows == full_rows, (grown_rows, full_rows)

        out[sf] = {
            "corpus_rows": n_total,
            "delta_rows": n_delta,
            "delta_fraction": round(n_delta / n_total, 4),
            "full_ingest_sec": round(full_sec, 3),
            "base_ingest_sec": round(base_sec, 3),
            "delta_append_sec": round(append_sec, 3),
            "append_over_full": round(append_sec / full_sec, 3),
            "index_rows_equal": True,
        }
        print(sf, out[sf], flush=True)

    report = {
        "metric": "l76_incremental_append_ingest",
        "generator": "scripts/gen_sf.py seed=42",
        "note": (
            "delta-append assigns ONLY the ~10% split against the "
            "frozen full-corpus quantizer and bucket-appends it; "
            "append_over_full ≈ delta_fraction + the fixed write "
            "floor means the nightly cost is linear in the delta, "
            "independent of corpus size. index_rows_equal re-checks "
            "the base+delta == full pin at this scale."
        ),
        "scales": out,
    }
    (REPO / "L76_APPEND.json").write_text(json.dumps(report, indent=1))
    print("wrote L76_APPEND.json")


if __name__ == "__main__":
    main()
