"""Scale rehearsal: bench the heavy tail at gen_sf sf0.1 AND sf1.0.

Round-7 verdict item 2: convert "designed for 100×" docstring claims
into MEASURED scaling. Both inputs come from scripts/gen_sf.py (same
generator, so the ratio is a pure data-volume effect — never mix the
driver's fixtures into a ratio). 10× rows with a ~linear plan should
give a wall ratio ≤ ~10 plus amortized fixed costs (session, codegen,
shuffle setup make it sublinear in practice); a ratio well above 10×
flags a superlinear plan (e.g. a candidate-pair join whose buckets
grow quadratically) that needs a plan fix or an explicit `weak` mark.

Timing recipe mirrors bench.py: one shared session, interleaved
rounds, two back-to-back reps per round (first-touch page-fault
shield), median reported, min kept as the floor.

Usage: python scripts/bench_scale.py [--quick]
       writes SCALE_REHEARSAL.json at the repo root; bench.py embeds
       that file into its one-line JSON so the driver's BENCH_r{N}
       records both scales.
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from hadoop_release_spark.plans.registry import all_queries  # noqa: E402
from hadoop_release_spark.session import get_session  # noqa: E402

#: The measured heavy tail (BENCH_r07 slowest) + the d02 anchor,
#: widened in round 8 with the next cost tier (LSH/gram dedup
#: chains, iterative kmeans, PQ search, window chains, two-phase
#: sorts) and the round-8 additions — scaling surprises hide in
#: queries nobody benchmarks.
HEAVY_TAIL = [
    "d02_agg_groupby",
    "d37_poisson_bootstrap",
    "l58_knn_self_join",
    "d43_theil_sen",
    "i10_mr_pagerank",
    "l28_decontaminate",
    "d26_weighted_median",
    "f06_skyline",
    "l14_dedup_embedding",
    "l56_semdedup",
    # round-8 widening
    "l02_dedup_near",
    "l22_dedup_survivors",
    "l21_kmeans",
    "l47_pq_ann",
    "l48_semantic_decontaminate",
    "e11_sessionize",
    "d23_hist_equidepth",
    "f04_total_order_sort",
    "c13_join_star",
    "e12_funnel",
    # round-8 additions
    "d44_theil_sen_hourly",
    "k12_token_bucket",
    "e42_entity_robust_anomaly_days",
    "l64_corpus_diff_drilldown",
    # round-9 additions
    "a19_dynamic_partition_overwrite",
    "d45_anova",
    "e43_seasonal_adjust",
    "e44_holt_trend",
    "l65_temperature_mix",
    # round-9b additions
    "d46_spearman",
    "d47_nelson_aalen",
    "d48_concentration",
    "f07_diversified_topk",
    "g09_symmetric_diff",
    "l66_containment_dedup",
    # round-9c additions
    "d49_jensen_shannon",
    "d50_mann_kendall",
    "d51_ljung_box",
    "e45_changepoint",
    "e46_seasonal_strength",
    "g10_relational_division",
    "l67_dsir_weights",
    "l68_minhash_calibration",
    "l69_langid_confusion",
    "m12_image_dup_survivors",
]

SFS = [0.1, 1.0]


def _ensure_fixtures() -> dict[float, str]:
    dirs = {}
    for sf in SFS:
        d = REPO / ".localdata" / f"sf{sf:g}"
        # embeddings is the LAST table gen_sf writes — its presence
        # means the whole directory completed (review finding: a
        # generation interrupted after lineitem looked complete).
        if not (d / "embeddings.parquet").exists():
            print(f"generating gen_sf fixtures at sf={sf:g} …", file=sys.stderr)
            subprocess.run(
                [sys.executable, str(REPO / "scripts" / "gen_sf.py"), str(sf)],
                check=True,
            )
        dirs[sf] = str(d)
    return dirs


def main() -> None:
    rounds = 1 if "--quick" in sys.argv else 2
    # Optional name-prefix filter: measure only the matching heavy-
    # tail queries and MERGE their rows into the existing
    # SCALE_REHEARSAL.json (so adding a round's new ops doesn't
    # force a full re-measurement of the carried record).
    prefixes = tuple(a for a in sys.argv[1:] if not a.startswith("--"))
    dirs = _ensure_fixtures()
    spark = get_session("hadoop-release-spark-bench-scale")
    available = all_queries()
    names = [n for n in HEAVY_TAIL if n in available]
    if prefixes:
        names = [n for n in names if n.startswith(prefixes)]

    # Warmup both scales' parquet footers + codegen once.
    for sf in SFS:
        available["d02_agg_groupby"](spark, dirs[sf]).toPandas()

    samples: dict[float, dict[str, list[float]]] = {
        sf: {n: [] for n in names} for sf in SFS
    }
    for _ in range(rounds):
        for name in names:
            for sf in SFS:
                for _rep in range(2):
                    t0 = time.perf_counter()
                    available[name](spark, dirs[sf]).toPandas()
                    samples[sf][name].append(time.perf_counter() - t0)
                print(
                    f"  {name} sf{sf:g}: "
                    f"{min(samples[sf][name]):.2f}s", file=sys.stderr,
                )

    report: dict = {
        "metric": "heavy_tail_scale_rehearsal",
        "generator": "scripts/gen_sf.py seed=42",
        "sfs": SFS,
        "row_ratio": 10.0,
        "queries": {},
    }
    out = REPO / "SCALE_REHEARSAL.json"
    if prefixes and out.exists():
        # Filtered run: keep the carried record's rows for everything
        # not re-measured here.
        report["queries"] = json.loads(out.read_text()).get("queries", {})
    for name in names:
        med = {
            sf: round(statistics.median(samples[sf][name]), 3) for sf in SFS
        }
        mn = {sf: round(min(samples[sf][name]), 3) for sf in SFS}
        ratio = round(med[1.0] / med[0.1], 2) if med[0.1] > 0 else None
        ratio_min = round(mn[1.0] / mn[0.1], 2) if mn[0.1] > 0 else None
        report["queries"][name] = {
            "sf0.1_median_sec": med[0.1],
            "sf1_median_sec": med[1.0],
            "ratio_median": ratio,
            "sf0.1_min_sec": mn[0.1],
            "sf1_min_sec": mn[1.0],
            "ratio_min": ratio_min,
        }
        print(f"{name}: {med[0.1]}s -> {med[1.0]}s  ({ratio}x)", file=sys.stderr)

    out.write_text(json.dumps(report, indent=1) + "\n")
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
