"""Semantic tests for the round-3 analytics operators (e11, i09,
i10, l33) — each pins the operator's MEANING, beyond the oracle
hash-parity that tests/test_contract.py already enforces."""

from __future__ import annotations

from collections import defaultdict

from hadoop_release_spark.catalog import table
from hadoop_release_spark.plans.e_windows import SESSION_GAP_US, e11_sessionize
from hadoop_release_spark.plans.i_mapreduce import (
    PR_BASE,
    PR_ITERS,
    PR_TELEPORT,
    i09_mr_inverted_index,
    i10_mr_pagerank,
)
from hadoop_release_spark.plans.l_pipeline import l33_quantize_embeddings

from pyspark.sql import functions as F


def test_sessionize_partitions_events_and_respects_gap(spark, sf_dir):
    """Sessions must tile each user's stream exactly: every event in
    one session, intra-session gaps ≤ threshold, inter-session gaps
    > threshold, session bounds consistent."""
    ev = (
        table(spark, sf_dir, "events")
        .select("user_id", F.unix_micros("ts").alias("t_us"))
        .collect()
    )
    by_user = defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append(r["t_us"])
    for times in by_user.values():
        times.sort()

    sessions = e11_sessionize(spark, sf_dir).collect()
    assert sum(s["n_events"] for s in sessions) == len(ev)

    by_user_sess = defaultdict(list)
    for s in sessions:
        assert s["start_us"] <= s["end_us"]
        by_user_sess[s["user_id"]].append(s)
    assert set(by_user_sess) == set(by_user)

    for uid, sess in by_user_sess.items():
        sess.sort(key=lambda s: s["start_us"])
        # consecutive sessions separated by more than the gap
        for a, b in zip(sess, sess[1:]):
            assert b["start_us"] - a["end_us"] > SESSION_GAP_US
        # session boundaries re-derived from the raw stream agree
        expected = 1
        times = by_user[uid]
        for prev, cur in zip(times, times[1:]):
            if cur - prev > SESSION_GAP_US:
                expected += 1
        assert len(sess) == expected
        assert sess[0]["start_us"] == times[0] and sess[-1]["end_us"] == times[-1]


def test_inverted_index_postings_are_correct_and_sorted(spark, sf_dir):
    docs = {
        r["doc_id"]: set(t for t in r["text"].split(" ") if t)
        for r in table(spark, sf_dir, "documents").collect()
    }
    rows = i09_mr_inverted_index(spark, sf_dir).collect()
    seen_terms = set()
    for r in rows:
        seen_terms.add(r["term"])
        postings = [int(x) for x in r["postings"].split(",")]
        assert postings == sorted(postings)
        assert len(postings) == r["df"]
        for d in postings:
            assert r["term"] in docs[d], (r["term"], d)
    assert seen_terms == set().union(*docs.values())


def test_pagerank_matches_pure_python_integer_replay(spark, sf_dir):
    """Replay the exact integer-arithmetic recurrence in pure Python
    over the collected edge list — the Spark loop must reproduce it
    bit-for-bit (that is the whole determinism design)."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    edges = {
        (r["src"], r["dst"])
        for r in (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .join(c, o.o_custkey == c.c_custkey)
            .join(s, li.l_suppkey == s.s_suppkey)
            .filter(F.col("s_nationkey") != F.col("c_nationkey"))
            .select(F.col("s_nationkey").alias("src"), F.col("c_nationkey").alias("dst"))
            .distinct()
            .collect()
        )
    }
    nodes = [r["n_nationkey"] for r in table(spark, sf_dir, "nation").collect()]
    outdeg = defaultdict(int)
    for src, _ in edges:
        outdeg[src] += 1

    pr = {v: PR_BASE for v in nodes}
    for _ in range(PR_ITERS):
        incoming = defaultdict(int)
        for src, dst in edges:
            incoming[dst] += pr[src] // outdeg[src]
        pr = {v: PR_TELEPORT + (85 * incoming[v]) // 100 for v in nodes}

    got = {
        r["n_nationkey"]: r["pagerank_scaled"]
        for r in i10_mr_pagerank(spark, sf_dir).collect()
    }
    assert got == pr
    # ranks differentiated: the trade graph is not rank-uniform
    assert len(set(pr.values())) > 1


def test_quantize_embeddings_codes_bounded_and_invertible(spark, sf_dir):
    """Codes in [0,255]; dequantization reconstructs each value to
    within half a grid cell of the per-dimension range."""
    vecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in table(spark, sf_dir, "embeddings").collect()
    }
    dims = len(next(iter(vecs.values())))
    mn = [min(v[i] for v in vecs.values()) for i in range(dims)]
    mx = [max(v[i] for v in vecs.values()) for i in range(dims)]

    rows = l33_quantize_embeddings(spark, sf_dir).collect()
    assert {r["vec_id"] for r in rows} == set(vecs)
    for r in rows:
        codes = [int(x) for x in r["q8"].split(",")]
        assert len(codes) == dims
        for i, q in enumerate(codes):
            assert 0 <= q <= 255
            cell = (mx[i] - mn[i]) / 255 if mx[i] > mn[i] else 0.0
            recon = mn[i] + q * cell
            assert abs(recon - vecs[r["vec_id"]][i]) <= cell / 2 + 1e-9
