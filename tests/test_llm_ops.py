"""LLM-operator semantics: planted-duplicate recall for MinHash LSH
(the rows-only contract query l02 can't be oracle-checked, so its
correctness is pinned here)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop_release_spark.operators.dedup import lsh_candidate_pairs, word_shingles


@pytest.fixture(scope="module")
def corpus(spark):
    base = [
        (i, f"token{i}a token{i}b " + " ".join(f"word{i}_{j}" for j in range(20)))
        for i in range(50)
    ]
    # Planted near-duplicates: copy docs 0-4 with one word changed.
    near = [
        (100 + i, base[i][1].replace(f"word{i}_10", "CHANGED"))
        for i in range(5)
    ]
    # Planted exact duplicate of doc 7.
    exact = [(200, base[7][1])]
    return spark.createDataFrame(base + near + exact, "doc_id long, text string")


def test_lsh_finds_planted_near_duplicates(corpus):
    pairs = lsh_candidate_pairs(corpus, "doc_id", "text", jaccard_threshold=0.5)
    found = {(r.id_a, r.id_b) for r in pairs.collect()}
    for i in range(5):
        assert (i, 100 + i) in found, f"missed planted near-dup pair ({i}, {100+i})"
    assert (7, 200) in found, "missed planted exact dup"


def test_lsh_no_false_positives_above_threshold(corpus):
    # Unrelated docs share no vocabulary → no pair between two base
    # docs should survive the Jaccard filter.
    pairs = lsh_candidate_pairs(corpus, "doc_id", "text", jaccard_threshold=0.5)
    for r in pairs.collect():
        assert r.id_b >= 100, f"false positive pair ({r.id_a}, {r.id_b}) j={r.jaccard}"
        assert r.jaccard >= 0.5


def test_exact_dup_jaccard_is_one(corpus):
    pairs = lsh_candidate_pairs(corpus, "doc_id", "text", jaccard_threshold=0.5)
    row = pairs.filter((F.col("id_a") == 7) & (F.col("id_b") == 200)).collect()[0]
    assert row.jaccard == 1.0


def test_shingles_short_doc(spark):
    df = spark.createDataFrame([(1, "only two")], "doc_id long, text string")
    out = df.select(word_shingles(F.col("text"), 3).alias("s")).collect()[0]
    assert out.s == ["only two"]


def test_connected_components_chain_transitivity(spark):
    # a~b and b~c (but no a~c pair) must land in ONE component.
    from hadoop_release_spark.operators.dedup import connected_components_min_label

    nodes = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 5, 9]], "__id long")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "id_a long, id_b long"
    )
    comps = {
        r["__id"]: r.component
        for r in connected_components_min_label(nodes, pairs).collect()
    }
    assert comps[1] == comps[2] == comps[3] == 1
    assert comps[4] == comps[5] == 4
    assert comps[9] == 9  # isolated node is its own survivor


def test_connected_components_long_chain_converges(spark):
    """Pointer-jump convergence: a 500-node path graph (diameter
    499) must fully label to component 0 within the default
    max_iters=10 — pure min-label propagation would need 499
    rounds; the per-round label[label] jump makes it O(log d).
    Also exercises the per-round localCheckpoint path (the lineage
    truncation that keeps iteration plans from embedding the
    upstream pipeline)."""
    from pyspark.sql import functions as F

    from hadoop_release_spark.operators.dedup import (
        connected_components_min_label,
    )

    nodes = spark.range(500).select(F.col("id").alias("__id"))
    pairs = spark.range(499).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    out = connected_components_min_label(nodes, pairs, id_col="__id")
    rows = out.collect()
    assert len(rows) == 500
    assert all(r.component == 0 for r in rows)


def test_l73_tiers_match_python_tercile_rule(spark, sf_dir):
    """l73's head/middle/tail assignment vs a pure-Python replay of
    the lower-tercile rule over l43's own scores: bounds are SELECTED
    score elements (min v with 3*cumw >= k*total per language), tiers
    partition each language roughly in thirds."""
    from collections import Counter, defaultdict

    from hadoop_release_spark.catalog import table
    from hadoop_release_spark.plans.l_llm_ext import (
        l43_lm_score,
        l73_perplexity_buckets,
    )

    d = table(spark, sf_dir, "documents").select("doc_id", "lang")
    lang = {r.doc_id: r.lang for r in d.collect()}
    nll = {r.doc_id: r.avg_nll for r in l43_lm_score(spark, sf_dir).collect()}
    out = {r.doc_id: r for r in l73_perplexity_buckets(spark, sf_dir).collect()}
    assert set(out) == set(nll)

    per_lang = defaultdict(list)
    for doc, v in nll.items():
        per_lang[lang[doc]].append(v)

    def lower_quantile(xs, k):
        # min v with 3*cumw >= k*total over the weighted distinct grid
        xs = sorted(xs)
        total = len(xs)
        cum = 0
        for v in xs:
            cum += 1
            if 3 * cum >= k * total:
                return v
        return xs[-1]

    bounds = {
        lg: (lower_quantile(vs, 1), lower_quantile(vs, 2))
        for lg, vs in per_lang.items()
    }
    for doc, r in out.items():
        t1, t2 = bounds[lang[doc]]
        want = "head" if nll[doc] <= t1 else ("middle" if nll[doc] <= t2 else "tail")
        assert r.tier == want, (doc, r.tier, want, nll[doc], t1, t2)
        assert r.lang == lang[doc] and r.avg_nll == nll[doc]
    # every language with >= 3 docs has all three tiers inhabited
    for lg, vs in per_lang.items():
        if len(set(vs)) >= 3:
            tiers = Counter(out[d2].tier for d2 in out if lang[d2] == lg)
            assert set(tiers) == {"head", "middle", "tail"}, (lg, tiers)


def test_minhash_arrow_kernel_equals_expression(spark, sf_dir):
    """Round-11 hot-path pin: the Arrow numpy MinHash kernel must
    produce BIT-IDENTICAL signatures to the reference JVM expression
    form on the real corpus (exact int64 arithmetic both sides — a
    drift here would silently change every LSH candidate set)."""
    from hadoop_release_spark.catalog import table
    from hadoop_release_spark.operators.dedup import (
        minhash_from_hashes,
        minhash_from_hashes_expr,
        shingle_hashes,
    )

    d = table(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        shingle_hashes(word_shingles(F.col("text"))).alias("__h"),
    )
    try:
        mismatches = (
            base.select(
                "doc_id",
                minhash_from_hashes(F.col("__h")).alias("ka"),
                minhash_from_hashes_expr(F.col("__h")).alias("ke"),
            )
            .filter(F.col("ka") != F.col("ke"))
            .count()
        )
        assert mismatches == 0
    finally:
        spark.catalog.clearCache()


def test_minhash_arrow_kernel_degenerate_inputs(spark):
    """Round-12 advisor fix: the numpy kernel must match the
    expression form on inputs word_shingles never emits but a public
    caller can — empty array, null array, null elements, all-null
    array. The expression form yields [null]*num_hashes for
    null/empty (each array_min sees no elements) and SKIPS null
    elements (array_min null semantics); the kernel used to raise
    ValueError/TypeError on these."""
    from hadoop_release_spark.operators.dedup import (
        minhash_from_hashes,
        minhash_from_hashes_expr,
    )

    df = spark.createDataFrame(
        [
            (1, [5, 7, 11]),
            (2, []),
            (3, None),
            (4, [None, 9]),
            (5, [None, None]),
        ],
        "id long, h array<long>",
    )
    rows = (
        df.select(
            "id",
            minhash_from_hashes(F.col("h"), 8).alias("ka"),
            minhash_from_hashes_expr(F.col("h"), 8).alias("ke"),
        )
        .orderBy("id")
        .collect()
    )
    for r in rows:
        assert r["ka"] == r["ke"], f"id={r['id']}: {r['ka']} != {r['ke']}"
    # The degenerate shapes specifically yield the all-null signature.
    assert rows[1]["ka"] == [None] * 8
    assert rows[2]["ka"] == [None] * 8
    assert rows[4]["ka"] == [None] * 8


def test_shingle_sketch_equals_expression(spark, sf_dir):
    """Round-13 hot-path pin: the shingle_sketch Arrow kernel must
    produce BIT-IDENTICAL (shingles, hashes) arrays to the
    word_shingles + shingle_hashes expression forms on the real
    corpus — order included (first-occurrence distinct). These
    values are oracle-replayed (minhash math + exact-Jaccard
    verification), so unlike gram_keys a bijection is not enough."""
    from hadoop_release_spark.catalog import table
    from hadoop_release_spark.operators.dedup import (
        shingle_hashes,
        shingle_sketch,
        word_shingles,
    )

    d = table(spark, sf_dir, "documents")
    both = d.select(
        "doc_id",
        shingle_sketch(F.col("text")).alias("__sk"),
        word_shingles(F.col("text")).alias("__se"),
    ).select(
        "doc_id",
        "__sk",
        "__se",
        shingle_hashes(F.col("__se")).alias("__he"),
    )
    mism = both.filter(
        (F.col("__sk.shingles") != F.col("__se"))
        | (F.col("__sk.hashes") != F.col("__he"))
    ).count()
    assert mism == 0


def test_shingle_sketch_degenerate_shapes(spark):
    """Planted shapes: whole-text fallback under k tokens, repeated
    shingles collapse in first-occurrence order, empty and null
    text mirror the expression forms exactly."""
    from hadoop_release_spark.operators.dedup import shingle_sketch

    rows = [
        (1, "a b c d"),
        (2, "a b"),            # < k: whole-text fallback
        (3, ""),               # one empty token
        (4, None),             # null text
        (5, "a b c a b c a b c"),  # repeats: distinct, first-occurrence
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["__sk"]["shingles"], r["__sk"]["hashes"])
        for r in df.select(
            "doc_id", shingle_sketch(F.col("text"), 3).alias("__sk")
        ).collect()
    }
    assert out[1][0] == ["a b c", "b c d"]
    assert out[2][0] == ["a b"]
    assert out[3][0] == [""]
    assert out[4][0] == [None] and out[4][1] == [None]
    # 7 windows over "a b c a b c a b c" collapse to 3 distinct, in
    # first-occurrence order
    assert out[5][0] == ["a b c", "b c a", "c a b"]
    for doc, (sh, hs) in out.items():
        assert len(sh) == len(hs)


def test_shingles3_sub3_token_docs_yield_empty_not_crash(spark):
    """Round-14 ADVICE regression: _shingles3 on docs under 3 tokens
    used to build a DESCENDING sequence(1, n-2) whose element_at(0)
    threw INVALID_ARRAY_INDEX_IN_ELEMENT_AT at runtime. The guard
    must yield an EMPTY gram set (the oracle's empty-range behavior)
    and leave ≥3-token docs byte-identical."""
    from hadoop_release_spark.plans.l_llm_ext import _shingles3

    df = spark.createDataFrame(
        [(1, "solo"), (2, "two words"), (3, ""), (4, "a b c d")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r.s
        for r in df.select("doc_id", _shingles3().alias("s")).collect()
    }
    assert out[1] == [] and out[2] == [] and out[3] == []
    assert out[4] == ["a b c", "b c d"]


def test_df_guard_agg_form_equals_window_form_l66(spark, sf_dir, monkeypatch):
    """Round-14 ADVICE item 1 (l66 leg): the selectable agg df-guard
    yields rows identical to the window form."""
    from hadoop_release_spark.operators import dedup as dd
    from hadoop_release_spark.plans.l_llm_ext import l66_containment_dedup

    monkeypatch.setattr(dd, "DF_GUARD_FORM", "window")
    base = sorted(map(tuple, l66_containment_dedup(spark, sf_dir).collect()))
    monkeypatch.setattr(dd, "DF_GUARD_FORM", "agg")
    agg = sorted(map(tuple, l66_containment_dedup(spark, sf_dir).collect()))
    assert base == agg
    assert base, "empty l66 result makes the pin vacuous"


def test_shingle_sketch_sig_equals_staged(spark, sf_dir):
    """r16 fused-kernel pin: shingle_sketch_sig must produce
    BIT-IDENTICAL (shingles, signature) to the two-kernel chain
    (shingle_sketch → minhash_from_hashes) on the real corpus — the
    signature values are oracle-replayed (l68's n_match), so value
    equality is required, not bijection. Degenerate shapes too:
    null text → [NULL] shingles + all-null signature; an under-k
    doc → the whole-text gram's signature."""
    from hadoop_release_spark.catalog import table
    from hadoop_release_spark.operators.dedup import (
        minhash_from_hashes,
        shingle_sketch,
        shingle_sketch_sig,
    )

    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    degen = spark.createDataFrame(
        [(90001, None), (90002, "one two"), (90003, "")],
        "doc_id long, text string",
    )
    both = (
        d.unionByName(degen)
        .select(
            "doc_id",
            shingle_sketch_sig(F.col("text")).alias("__f"),
            shingle_sketch(F.col("text")).alias("__sk"),
        )
        .select(
            "doc_id",
            "__f",
            F.col("__sk.shingles").alias("__se"),
            minhash_from_hashes(F.col("__sk.hashes")).alias("__me"),
        )
    )
    rows = both.collect()
    assert rows
    for r in rows:
        assert list(r["__f"]["shingles"] or []) == list(r["__se"] or []), r
        assert list(r["__f"]["sig"] or []) == list(r["__me"] or []), r
