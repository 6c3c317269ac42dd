"""Generate schema-compatible synthetic fixtures at arbitrary SF.

The driver ships read-only fixtures at sf ≤ 0.1 (TESTDATA.md). The
round-7 verdict asks for a 10× scale rehearsal (sf1.0) to convert
"designed for 100×" claims into measured sub-linear/linear scaling —
that needs bigger inputs than the driver provides, so this generator
reproduces the FIXTURES.md schemas (physical parquet types included:
int32/int64/double/string/timestamp[us]/list<float>) and domain
shapes (key relationships, value ranges, 31-word document vocabulary,
30-day event span, 10-label embedding clusters) at any SF.

NOT a correctness oracle source: values are deterministic (seed 42)
but intentionally not byte-identical to the driver's — scale ratios
must therefore be computed between two SFs of THIS generator
(scripts/bench_scale.py generates both 0.1 and 1.0), never by mixing
generators.

Usage: python scripts/gen_sf.py SF [outdir]
       default outdir: <repo>/.localdata/sf{SF}
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = Path(__file__).resolve().parent.parent

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
STATUSES = ["F", "O", "P"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = ["de", "en", "es", "fr", "zh"]
# 31-word vocabulary mirroring the driver's word-soup documents
VOCAB = (
    "key agg row scan slow fast table value part hash merge batch spark a "
    "the line sort window join shuffle plan query group filter map reduce "
    "cache disk read write stage"
).split()
assert len(VOCAB) == 31

US = 1_000_000  # microseconds per second


def _ts_us(start: str, end: str, n: int, rng) -> pa.Array:
    lo = np.datetime64(start, "us").astype(np.int64)
    hi = np.datetime64(end, "us").astype(np.int64)
    vals = rng.integers(lo, hi, n)
    return pa.array(vals, type=pa.timestamp("us"))


def _write(outdir: Path, name: str, table: pa.Table) -> None:
    pq.write_table(table, outdir / f"{name}.parquet", compression="snappy")
    print(f"  {name}: {table.num_rows} rows")


def generate(sf: float, outdir: Path) -> None:
    outdir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(42)

    n_cust = max(int(150_000 * sf), 5)
    n_supp = max(int(10_000 * sf), 2)
    n_part = max(int(200_000 * sf), 5)
    n_ord = max(int(1_500_000 * sf), 10)
    n_line = max(int(6_000_000 * sf), 20)
    n_evt = max(int(10_000_000 * sf * 0.1), 20)  # 1M at sf1
    n_users = max(int(15_000 * sf), 2)
    n_doc = max(int(50_000 * sf), 10)
    n_emb = max(int(20_000 * sf), 10)

    _write(outdir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": pa.array(REGIONS),
    }))
    _write(outdir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": pa.array([f"NATION_{i}" for i in range(25)]),
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))
    _write(outdir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)]),
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": pa.array(
            np.round(rng.uniform(-999.99, 9999.99, n_cust), 2)),
        "c_mktsegment": pa.array(
            np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]),
    }))
    _write(outdir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_supp)]),
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": pa.array(
            np.round(rng.uniform(-999.99, 9999.99, n_supp), 2)),
    }))
    colors = ["red", "green", "blue", "small", "large", "shiny"]
    nouns = ["ring", "widget", "bolt", "gear", "cog", "pin"]
    _write(outdir, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": pa.array([
            f"{colors[i % 6]} {nouns[(i // 6) % 6]}" for i in range(n_part)
        ]),
        "p_brand": pa.array(
            [f"Brand#{i}" for i in rng.integers(1, 26, n_part)]),
        "p_type": pa.array(np.array(
            ["ECONOMY", "STANDARD", "PROMO", "SMALL", "MEDIUM", "LARGE"]
        )[rng.integers(0, 6, n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": pa.array(
            np.round(900.0 + 0.1 * (np.arange(n_part) % 1000), 2)),
    }))
    _write(outdir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(
            np.array(STATUSES)[rng.integers(0, 3, n_ord)]),
        "o_totalprice": pa.array(
            np.round(rng.uniform(1000.0, 500_000.0, n_ord), 2)),
        "o_orderdate": _ts_us("1995-01-01", "2001-08-01", n_ord, rng),
        "o_orderpriority": pa.array(
            np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]),
    }))
    # lineitem: orders get 1..7 lines (orderkey repeats, linenumber is
    # the within-order sequence) until n_line rows exist.
    per_order = rng.integers(1, 8, n_ord)
    csum = np.cumsum(per_order)
    cut = int(np.searchsorted(csum, n_line))
    per_order = per_order[: cut + 1]
    total = int(per_order.sum())
    l_orderkey = np.repeat(np.arange(len(per_order)), per_order)
    l_linenumber = (
        np.arange(total) - np.repeat(csum[: cut + 1] - per_order, per_order)
    ) + 1
    _write(outdir, "lineitem", pa.table({
        "l_orderkey": pa.array(l_orderkey, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, total), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, total), pa.int64()),
        "l_linenumber": pa.array(l_linenumber, pa.int32()),
        "l_quantity": pa.array(rng.integers(1, 51, total).astype(np.float64)),
        "l_extendedprice": pa.array(
            np.round(rng.uniform(901.0, 105_000.0, total), 2)),
        "l_discount": pa.array(
            np.round(rng.integers(0, 11, total) / 100.0, 2)),
        "l_tax": pa.array(np.round(rng.integers(0, 9, total) / 100.0, 2)),
        "l_returnflag": pa.array(
            np.array(["A", "N", "R"])[rng.integers(0, 3, total)]),
        "l_linestatus": pa.array(
            np.array(["F", "O"])[rng.integers(0, 2, total)]),
        "l_shipdate": _ts_us("1995-01-02", "2001-11-04", total, rng),
    }))
    ts = np.sort(rng.integers(
        np.datetime64("2024-01-01", "us").astype(np.int64),
        np.datetime64("2024-01-31", "us").astype(np.int64),
        n_evt,
    ))
    _write(outdir, "events", pa.table({
        "event_id": pa.array(np.arange(n_evt), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, n_users, n_evt), pa.int64()),
        "event_type": pa.array(
            np.array(EVENT_TYPES)[rng.integers(0, 5, n_evt)]),
        "value": pa.array(
            np.round(np.clip(rng.lognormal(2.5, 1.0, n_evt), 0.01, 490.0), 2)),
        "props": pa.array(
            [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_evt)]),
    }))
    # documents: ~54-word soup over the 31-word vocabulary; ~1% exact
    # duplicates and ~2% near-duplicates (one word mutated) so the
    # dedup operators have real work at every SF.
    lens = np.clip(rng.poisson(54, n_doc), 8, 110)
    words = rng.integers(0, 31, int(lens.sum()))
    texts: list[str] = []
    off = 0
    va = np.array(VOCAB)
    for ln in lens:
        texts.append(" ".join(va[words[off : off + ln]]))
        off += ln
    dup_idx = rng.integers(0, n_doc, max(n_doc // 100, 1))
    for i in dup_idx:
        j = int(rng.integers(0, n_doc))
        texts[i] = texts[j]
    near_idx = rng.integers(0, n_doc, max(n_doc // 50, 1))
    for i in near_idx:
        j = int(rng.integers(0, n_doc))
        toks = texts[j].split()
        toks[int(rng.integers(0, len(toks)))] = va[int(rng.integers(0, 31))]
        texts[i] = " ".join(toks)
    _write(outdir, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(np.array(LANGS)[rng.integers(0, 5, n_doc)]),
        "source": pa.array(
            [f"src{s}" for s in rng.integers(0, 20, n_doc)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))
    # embeddings: 10 label clusters in 64-d, float32 list column.
    centers = rng.normal(0.0, 0.15, (10, 64))
    labels = rng.integers(0, 10, n_emb)
    vecs = (centers[labels] + rng.normal(0.0, 0.08, (n_emb, 64))).astype(
        np.float32
    )
    _write(outdir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    }))


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    outdir = (
        Path(sys.argv[2])
        if len(sys.argv) > 2
        else REPO / ".localdata" / f"sf{sf:g}"
    )
    print(f"generating sf={sf:g} → {outdir}")
    generate(sf, outdir)


if __name__ == "__main__":
    main()
