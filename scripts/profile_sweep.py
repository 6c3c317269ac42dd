"""Profile the driver-shaped correctness sweep: per-query wall time.

Simulates the external driver: an UNCONFIGURED SparkSession, then
each queries()[name] materialized via toPandas() and compared to its
DuckDB oracle (same canonicalization as tests/_harness.py). Prints a
sorted per-query timing table so optimization targets are data, not
guesses.

Usage: python scripts/profile_sweep.py [sf_dir] [name_prefix ...]
       python scripts/profile_sweep.py [sf_dir] --first N   # grading window
       python scripts/profile_sweep.py [sf_dir] --range A B  # order slice [A,B)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

from pyspark.sql import SparkSession  # noqa: E402

import _harness  # noqa: E402
import __spark_entry__ as entry_mod  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    first = None
    rng = None
    rest = sys.argv[2:]
    if rest[:1] == ["--first"]:
        first, rest = int(rest[1]), rest[2:]
    elif rest[:1] == ["--range"]:
        rng, rest = (int(rest[1]), int(rest[2])), rest[3:]
    prefixes = tuple(rest) or None

    t0 = time.perf_counter()
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("fake-driver-profile")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )  # deliberately unconfigured beyond UI silencing
    t_session = time.perf_counter() - t0

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    con = _harness.open_oracle(sf_dir)

    rows = []
    failures = []
    names = list(qs)
    if first:
        names = names[:first]
    elif rng:
        names = names[rng[0] : rng[1]]
    for name in names:
        fn = qs[name]
        if prefixes and not name.startswith(prefixes):
            continue
        t1 = time.perf_counter()
        status = "ok"
        try:
            df = fn(spark, sf_dir)
            pdf = df.toPandas()
            t_spark = time.perf_counter() - t1
            t2 = time.perf_counter()
            if name in oracles:
                b = con.execute(oracles[name]).df()
                a_cols, b_cols = sorted(pdf.columns), sorted(b.columns)
                if a_cols != b_cols or len(pdf) != len(b):
                    status = "MISMATCH(shape)"
                else:
                    ra = _harness._rows(pdf[a_cols])
                    rb = _harness._rows(b[b_cols])
                    if ra != rb:
                        status = "MISMATCH(values)"
            else:
                status = "rows-only" if len(pdf) > 0 else "EMPTY"
            t_oracle = time.perf_counter() - t2
        except Exception as exc:  # noqa: BLE001
            t_spark = time.perf_counter() - t1
            t_oracle = 0.0
            status = f"ERROR: {type(exc).__name__}: {exc}"[:200]
        total = t_spark + t_oracle
        rows.append((name, t_spark, t_oracle, total, status))
        if not status.startswith(("ok", "rows-only")):
            failures.append(name)
        print(f"{name:28s} spark={t_spark:7.2f}s oracle={t_oracle:6.2f}s  {status}", flush=True)

    rows.sort(key=lambda r: -r[3])
    total_all = sum(r[3] for r in rows)
    print(f"\n=== session startup: {t_session:.1f}s; sweep total: {total_all:.1f}s ===")
    print("=== slowest 20 ===")
    for name, ts, to, tt, status in rows[:20]:
        print(f"{name:28s} {tt:7.2f}s  ({ts:.2f} spark + {to:.2f} oracle)  {status}")
    print(json.dumps({"failures": failures, "total_sec": round(total_all, 1)}))


if __name__ == "__main__":
    main()
