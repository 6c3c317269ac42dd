#!/usr/bin/env python
"""Fixture-schema tripwire: diff parquet footers against the expected
schema for every fixture table and fail LOUDLY on drift.

Round 3 lost a whole grading round because the driver silently
regenerated ``events.ts`` from INT64 TIMESTAMP(NANOS) to
timestamp[us]. This script makes the next regeneration a one-line
diagnostic instead of 36 test failures: run it directly
(``python scripts/check_fixture_schemas.py [sf_dir]``) or let
tests/test_catalog_fixtures.py's conftest hook run it per session.

Columns with several KNOWN-GOOD physical types (the shapes the
catalog normalizes) list all of them; anything else is drift.
Checks pure pyarrow footers — no Spark session needed, so it runs in
milliseconds.
"""

from __future__ import annotations

import sys

import pyarrow.parquet as pq

#: table -> ordered list of (column, {accepted arrow dtype strings}).
#: Accepted sets cover every shape the engine's normalization layer
#: handles; a dtype outside the set means catalog.py needs work.
EXPECTED: dict[str, list[tuple[str, set[str]]]] = {
    "region": [
        ("r_regionkey", {"int32", "int64"}),
        ("r_name", {"string", "large_string"}),
    ],
    "nation": [
        ("n_nationkey", {"int32", "int64"}),
        ("n_name", {"string", "large_string"}),
        ("n_regionkey", {"int32", "int64"}),
    ],
    "customer": [
        ("c_custkey", {"int64"}),
        ("c_name", {"string", "large_string"}),
        ("c_nationkey", {"int32", "int64"}),
        ("c_acctbal", {"double"}),
        ("c_mktsegment", {"string", "large_string"}),
    ],
    "supplier": [
        ("s_suppkey", {"int64"}),
        ("s_name", {"string", "large_string"}),
        ("s_nationkey", {"int32", "int64"}),
        ("s_acctbal", {"double"}),
    ],
    "part": [
        ("p_partkey", {"int64"}),
        ("p_name", {"string", "large_string"}),
        ("p_brand", {"string", "large_string"}),
        ("p_type", {"string", "large_string"}),
        ("p_size", {"int32", "int64"}),
        ("p_retailprice", {"double"}),
    ],
    "orders": [
        ("o_orderkey", {"int64"}),
        ("o_custkey", {"int64"}),
        ("o_orderstatus", {"string", "large_string"}),
        ("o_totalprice", {"double"}),
        # date32 would also be normalizable, but flag it: queries cast
        # via CAST(.. AS DATE)/timestamp and should be re-verified.
        ("o_orderdate", {"timestamp[us]", "timestamp[ns]", "timestamp[ms]"}),
        ("o_orderpriority", {"string", "large_string"}),
    ],
    "lineitem": [
        ("l_orderkey", {"int64"}),
        ("l_partkey", {"int64"}),
        ("l_suppkey", {"int64"}),
        ("l_linenumber", {"int32", "int64"}),
        ("l_quantity", {"double"}),
        ("l_extendedprice", {"double"}),
        ("l_discount", {"double"}),
        ("l_tax", {"double"}),
        ("l_returnflag", {"string", "large_string"}),
        ("l_linestatus", {"string", "large_string"}),
        ("l_shipdate", {"timestamp[us]", "timestamp[ns]", "timestamp[ms]"}),
    ],
    "events": [
        ("event_id", {"int64"}),
        # The two shapes catalog.normalize_events handles.
        ("ts", {"timestamp[us]", "timestamp[ns]"}),
        ("user_id", {"int64"}),
        ("event_type", {"string", "large_string"}),
        ("value", {"double"}),
        ("props", {"string", "large_string"}),
    ],
    "documents": [
        ("doc_id", {"int64"}),
        ("text", {"string", "large_string"}),
        ("lang", {"string", "large_string"}),
        ("source", {"string", "large_string"}),
        ("n_chars", {"int64"}),
    ],
    "embeddings": [
        ("vec_id", {"int64"}),
        (
            "embedding",
            {
                "list<element: float>",
                "list<item: float>",
                "large_list<element: float>",
                "list<element: double>",
                "list<item: double>",
            },
        ),
        ("label", {"int32", "int64"}),
    ],
}


def check(sf_dir: str) -> list[str]:
    """Return a list of human-readable drift findings (empty = clean)."""
    problems: list[str] = []
    for tbl, cols in EXPECTED.items():
        path = f"{sf_dir}/{tbl}.parquet"
        try:
            schema = pq.read_schema(path)
        except Exception as exc:  # noqa: BLE001 - report, don't crash
            problems.append(f"{tbl}: cannot read footer at {path}: {exc}")
            continue
        actual = {name: str(schema.field(name).type) for name in schema.names}
        for col, accepted in cols:
            if col not in actual:
                problems.append(f"{tbl}.{col}: MISSING (have {sorted(actual)})")
            elif actual[col] not in accepted:
                problems.append(
                    f"{tbl}.{col}: dtype drift — footer says {actual[col]!r}, "
                    f"engine handles {sorted(accepted)}"
                )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    problems = check(sf_dir)
    if problems:
        print(f"FIXTURE SCHEMA DRIFT in {sf_dir}:")
        for p in problems:
            print(f"  - {p}")
        return 1
    print(f"fixture schemas OK in {sf_dir} ({len(EXPECTED)} tables checked)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
