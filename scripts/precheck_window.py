"""Grading-window precheck: run the driver's exact shape over the
first N queries of grading_order (the window the external driver
will grade next round) on an UNCONFIGURED session at sf0.01, so a
regression in a stale-vintage op is caught before the driver does.

Usage: python scripts/precheck_window.py [--first N] [--all]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    import duckdb
    from pyspark.sql import SparkSession

    from hadoop_release_spark.plans.registry import (
        all_oracles,
        all_queries,
        grading_order,
        specs,
    )

    n = 50
    if "--all" in sys.argv:
        n = 10**9
    for a in sys.argv[1:]:
        if a.startswith("--first="):
            n = int(a.split("=", 1)[1])

    # Deliberately unconfigured — the driver's session, not ours.
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("precheck-window")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    qs, os_ = all_queries(), all_oracles()
    names = grading_order(list(specs()))[:n]
    bad = []
    t_start = time.perf_counter()
    for i, name in enumerate(names):
        t0 = time.perf_counter()
        try:
            a = qs[name](spark, SF_DIR).toPandas()
            if name not in os_:
                print(f"{i + 1:3d} {name}: rows-only {len(a)}"
                      f" ({time.perf_counter() - t0:.1f}s)")
                continue
            b = con.execute(os_[name]).df()
            a = a[sorted(a.columns)]
            b = b[sorted(b.columns)]
            ok = sorted(
                map(str, a.itertuples(index=False, name=None))
            ) == sorted(map(str, b.itertuples(index=False, name=None)))
            print(
                f"{i + 1:3d} {name}: {'MATCH' if ok else 'MISMATCH'} "
                f"{len(a)} ({time.perf_counter() - t0:.1f}s)"
            )
            if not ok:
                bad.append(name)
        except Exception as exc:  # noqa: BLE001 — precheck must not abort
            print(f"{i + 1:3d} {name}: ERROR {exc!r}")
            bad.append(name)
    print(
        f"== {len(names) - len(bad)}/{len(names)} green in "
        f"{time.perf_counter() - t_start:.1f}s; failures: {bad}"
    )
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
