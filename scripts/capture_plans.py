"""Capture .explain("formatted") for declared queries → plans/<round>/.

Usage: python scripts/capture_plans.py <suffix> [sf_dir] name [name ...]

Writes plans/$SPARK_GRAFT_PLANS_ROUND/<name>_<suffix>.txt for each
query (suffix = before / after; round defaults to r16). The judge
reads these files instead of running Spark, so every optimization
claim about plan shape (Exchange count, join strategy, PushedFilters,
Python-boundary nodes) must be visible here. Round-16 protocol fix
(r15 verdict item 2): before-plans are captured and committed at
round START, before any operator change.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from hadoop_release_spark.plans.registry import all_queries  # noqa: E402
from hadoop_release_spark.session import get_session  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    args = sys.argv[2:]
    if args and args[0].startswith("/"):
        sf_dir, names = args[0], args[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.1", args
    out_dir = REPO / "plans" / os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r16")
    out_dir.mkdir(parents=True, exist_ok=True)

    spark = get_session("plan-capture")
    qs = all_queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = out_dir / f"{name}_{suffix}.txt"
        path.write_text(plan)
        n_exchange = plan.count("Exchange")
        n_python = sum(
            plan.count(node)
            for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "MapInArrow", "FlatMapGroupsInPandas", "FlatMapCoGroupsInPandas")
        )
        print(f"{name:30s} -> {path.name}  Exchange={n_exchange} PythonNodes={n_python}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
