"""Decompose f04's decade-2 wall: engine sort vs driver transfer.

Round-14 find: f04_total_order_sort's first decade-2 row printed
16.8x median (11.0 -> 185.5 s, gen_sf sf1 -> sf10) — over the ~10x
linear envelope. But f04 is the one heavy-tail op whose CONTRACT
output is the ENTIRE corpus (every lineitem row, globally numbered),
so the rehearsal's toPandas() harness measures, on top of the
range-partitioned sort itself, a >1 GiB Arrow collect plus a
single-threaded driver-side pandas materialization that no real
pipeline would perform (a production TeraSort WRITES its output —
a6/a19's sink path — it does not collect it to one process).

This probe separates the two: per scale, time
  * engine-only — the identical plan written to the `noop` sink
    (full execution, zero driver transfer), and
  * collect     — the rehearsal's toPandas() form,
2 reps each, medians + decade ratios, into F04_TRANSFER.json.
Read the ENGINE ratio against the 10x envelope (the sort is
O(N log N) by construction — sample + range partition + in-partition
sort + broadcast offsets, operators/rank.py); the transfer delta is
the harness artifact, linear in bytes but paid on one thread.
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from hadoop_release_spark.plans.registry import all_queries  # noqa: E402
from hadoop_release_spark.session import get_session  # noqa: E402

SFS = [1.0, 10.0]
REPS = 2


def main() -> None:
    spark = get_session(
        "hadoop-release-spark-f04-transfer",
        extra_confs={"spark.driver.maxResultSize": "4g"},
    )
    fn = all_queries()["f04_total_order_sort"]
    dirs = {sf: str(REPO / ".localdata" / f"sf{sf:g}") for sf in SFS}
    out: dict = {
        "metric": "f04_engine_vs_transfer",
        "generator": "scripts/gen_sf.py seed=42",
        "sfs": SFS,
        "reps": REPS,
    }
    rows: dict = {}
    for sf in SFS:
        eng, col = [], []
        for _ in range(REPS):
            t0 = time.perf_counter()
            fn(spark, dirs[sf]).write.format("noop").mode("overwrite").save()
            eng.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            n = len(fn(spark, dirs[sf]).toPandas())
            col.append(time.perf_counter() - t0)
        rows[f"sf{sf:g}"] = {
            "engine_only_median_sec": round(statistics.median(eng), 3),
            "collect_median_sec": round(statistics.median(col), 3),
            "engine_only_min_sec": round(min(eng), 3),
            "collect_min_sec": round(min(col), 3),
            "rows": n,
        }
        print(f"sf{sf:g}: engine {rows[f'sf{sf:g}']}", file=sys.stderr)
    lo, hi = (f"sf{sf:g}" for sf in SFS)
    out["rows"] = rows
    out["engine_ratio_median"] = round(
        rows[hi]["engine_only_median_sec"] / rows[lo]["engine_only_median_sec"], 2
    )
    out["collect_ratio_median"] = round(
        rows[hi]["collect_median_sec"] / rows[lo]["collect_median_sec"], 2
    )
    out["transfer_share_sf10"] = round(
        1
        - rows[hi]["engine_only_median_sec"] / rows[hi]["collect_median_sec"],
        3,
    )
    (REPO / "F04_TRANSFER.json").write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
