"""l66 df-guard scale profile (round-12 verdict item 4).

Measures, at each gen_sf scale, the 3-gram document-frequency
distribution l66's candidate join runs over, and the CANDIDATE PAIR
WORK Σ C(df, 2) under (a) the shipped FIXED guard df ≤ 50 and (b) a
corpus-RATE-scaled guard df ≤ ε·N preserving sf0.1's admission rate
(ε = 1%, i.e. df ≤ 500 at sf1 / df ≤ 5000 at sf10).

Why this is the right measurement: l66's only superlinear risk is the
shingle-keyed self-join, whose input volume is exactly Σ C(df, 2)
over admitted shingles. Under a FIXED df cap that sum is bounded by
(MAX_DF-1)/2 · postings — LINEAR in corpus size, always. Under a
rate-scaled cap each near-boilerplate shingle's df grows ∝ N and the
sum grows ∝ N² wherever the type vocabulary saturates. The gen_sf
generator draws text from a bounded phrase pool (~29.8k 3-gram types
at every SF), which makes it the worst case for a rate guard and the
measurement cheap to read: see L66_GUARD_PROFILE.json and the
SCALE.md round-12 note.

DuckDB is used (not Spark) so the profile replays the oracle's own
shingle definition verbatim — the numbers describe the SEMANTICS,
engine-independently.

Usage: python scripts/profile_l66_guard.py
       writes L66_GUARD_PROFILE.json at the repo root.
"""

from __future__ import annotations

import json
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parent.parent

#: _O_SHINGLES3 from plans/l_llm_ext.py (kept verbatim — one rule).
SH = (
    "list_distinct(list_transform(range(1, len(string_split(text,' ')) - 1),"
    " i -> string_split(text,' ')[i] || ' ' ||"
    " string_split(text,' ')[i+1] || ' ' || string_split(text,' ')[i+2]))"
)

#: sf0.1's admission rate for the rate-scaled alternative: df ≤ 50 at
#: 5 000 docs = 1% of the corpus.
RATE = 0.01


def main() -> None:
    con = duckdb.connect()
    out: dict[str, dict[str, int]] = {}
    for sf in ("sf0.1", "sf1", "sf10"):
        path = REPO / ".localdata" / sf / "documents.parquet"
        if not path.exists():
            print(f"skipping {sf}: run scripts/gen_sf.py first")
            continue
        n_docs = con.execute(
            f"SELECT count(*) FROM read_parquet('{path}')"
        ).fetchone()[0]
        rate_cap = max(50, int(RATE * n_docs))
        row = con.execute(
            f"""
            WITH sh AS (
              SELECT doc_id, unnest({SH}) AS s
              FROM read_parquet('{path}')
            ), df AS (SELECT s, count(*) AS d FROM sh GROUP BY s)
            SELECT count(*) AS types,
                   sum(d) AS postings,
                   sum(CASE WHEN d <= 50 THEN d ELSE 0 END) AS postings_fixed50,
                   sum(CASE WHEN d > 50 THEN 1 ELSE 0 END) AS types_excluded_fixed50,
                   sum(CASE WHEN d <= 50 THEN d*(d-1)//2 ELSE 0 END) AS pairwork_fixed50,
                   sum(CASE WHEN d <= {rate_cap} THEN d*(d-1)//2 ELSE 0 END) AS pairwork_rate1pct
            FROM df
            """
        ).fetchone()
        keys = [
            "types",
            "postings",
            "postings_fixed50",
            "types_excluded_fixed50",
            "pairwork_fixed50",
            "pairwork_rate1pct",
        ]
        out[sf] = {"n_docs": int(n_docs), "rate_cap": rate_cap} | {
            k: int(v) for k, v in zip(keys, row)
        }
        print(sf, out[sf])
    report = {
        "metric": "l66_df_guard_scale_profile",
        "generator": "scripts/gen_sf.py seed=42",
        "shingle_rule": "_O_SHINGLES3 (shared l13/l66 word-3-gram)",
        "rate": RATE,
        "note": (
            "pairwork_* = sum over admitted shingles of C(df,2) — the "
            "candidate self-join input volume. fixed50 is bounded by "
            "24.5 x postings (linear forever); rate1pct measures "
            "~100x per decade on this bounded-vocabulary generator "
            "(quadratic)."
        ),
        "scales": out,
    }
    (REPO / "L66_GUARD_PROFILE.json").write_text(json.dumps(report, indent=1))
    print("wrote L66_GUARD_PROFILE.json")


if __name__ == "__main__":
    main()
