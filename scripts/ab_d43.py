"""d43 slopes-materialization A/B (r15 verdict item 1).

Interleaved n>=6 warm re-times of d43_theil_sen at the bench config
(local[$SPARK_GRAFT_CPUS], sf0.1 by default) across the three
materialization forms of the pairwise-slope table:
persist / localCheckpoint / none (unmaterialized).

Methodology = the repo's standing adjudication protocol: one session,
interleaved order REVERSED on alternate reps (a d43 A/B once inverted
purely on interleave order), per-mode MIN is the honest comparator,
median alongside. Row-parity asserted across modes first.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from hadoop_release_spark.plans import d_aggregates as dmod  # noqa: E402
from hadoop_release_spark.plans.registry import all_queries  # noqa: E402
from hadoop_release_spark.session import get_session  # noqa: E402

MODES = ["persist", "localCheckpoint", "none"]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_reps = int(os.environ.get("AB_REPS", "6"))
    spark = get_session("ab-d43")
    q = all_queries()["d43_theil_sen"]

    # Row parity across modes (1-row output; exact compare).
    frames = {}
    for mode in MODES:
        dmod._D43_SLOPES_MAT = mode
        frames[mode] = q(spark, sf_dir).toPandas()
    for mode in MODES[1:]:
        assert frames[mode].equals(frames[MODES[0]]), (
            f"d43 rows differ between {MODES[0]} and {mode}:\n"
            f"{frames[MODES[0]]}\n{frames[mode]}"
        )
    print("row parity across modes: OK", flush=True)

    samples: dict[str, list[float]] = {m: [] for m in MODES}
    for rep in range(n_reps):
        order = MODES if rep % 2 == 0 else MODES[::-1]
        for mode in order:
            dmod._D43_SLOPES_MAT = mode
            spark.sparkContext.setJobDescription(f"d43 A/B {mode} rep{rep}")
            t0 = time.perf_counter()
            q(spark, sf_dir).toPandas()
            samples[mode].append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
        print(
            f"rep {rep}: "
            + " ".join(f"{m}={samples[m][-1]:.3f}" for m in order),
            flush=True,
        )

    out = {
        m: {
            "min": round(min(ts), 3),
            "median": round(statistics.median(ts), 3),
            "all": [round(t, 3) for t in ts],
        }
        for m, ts in samples.items()
    }
    print(json.dumps(out, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
