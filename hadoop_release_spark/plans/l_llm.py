"""§2.L — LLM-data-pipeline operators (the north-star additions).

The ``documents`` and ``embeddings`` fixtures exist for exactly this
surface: deduplication, text analysis/quality scoring, TF-IDF,
n-grams, and embedding similarity search — the operations a 100 TB
training-data pipeline runs. Design notes per operator inline;
non-SQL-expressible ops (MinHash LSH) are rows-only with planted
-duplicate pytest coverage in tests/test_llm_ops.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_release_spark.catalog import table
from hadoop_release_spark.functions.contracts import davg, oavg, r3, r4
from hadoop_release_spark.functions.vectors import cosine, norm2, o_cosine, o_norm2
from hadoop_release_spark.plans.registry import register

_DIM = 64  # embeddings are 64-dimensional (FIXTURES.md)

#: l09's query-set bound (the vec_id filter) and the broadcast cap it
#: must stay under. Beyond the cap the broadcast-cross plan degrades
#: to an all-pairs scan; l19_knn_ivf is the unbounded production path.
_KNN_JOIN_QUERY_BOUND = 20
_KNN_JOIN_MAX_QUERIES = 1024


@register(
    "l01_dedup_exact",
    oracle="""
    SELECT md5(text) AS content_hash,
           min(doc_id) AS survivor_id,
           count(*) AS n_copies
    FROM documents
    GROUP BY md5(text)
    """,
)
def l01_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: md5 content hash (the portable hash — rule 6),
    keep the smallest doc_id per hash. One shuffle on the hash; at
    100 TB this is the cheapest dedup pass and always runs first."""
    d = table(spark, sf_dir, "documents")
    return d.groupBy(F.md5(F.col("text")).alias("content_hash")).agg(
        F.min("doc_id").alias("survivor_id"),
        F.count("*").alias("n_copies"),
    )


def _o_l02() -> str:
    # No explicit parameters: Spark call and oracle both inherit the
    # shared LSH_* defaults in operators/dedup.py, so they cannot
    # diverge.
    from hadoop_release_spark.operators.dedup import o_lsh_candidate_pairs

    return o_lsh_candidate_pairs()


@register("l02_dedup_near", oracle=_o_l02(), priority="P2")
def l02_dedup_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs via MinHash + banded LSH. ORACLE-CHECKED
    end-to-end: every hash in the pipeline is md5-derived (portable,
    contract rule 6) and band buckets are plain signature tuples, so
    the oracle replays shingling → 64 minhashes → 16-band blocking →
    candidate join → exact-Jaccard verify and the driver's value
    hash validates the ENTIRE construction, candidates included.
    Recall/precision additionally pytest-verified with planted
    near-duplicates. See operators/dedup.py for the scale analysis."""
    from hadoop_release_spark.operators.dedup import lsh_candidate_pairs

    d = table(spark, sf_dir, "documents")
    return lsh_candidate_pairs(d, id_col="doc_id", text_col="text")


@register(
    "l03_text_stats",
    oracle=f"""
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
           {oavg("CAST(n_chars AS DOUBLE)")} AS avg_chars,
           count(DISTINCT source) AS n_sources
    FROM documents
    GROUP BY lang
    """,
)
def l03_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus statistics per language — the first report any corpus
    pipeline produces."""
    d = table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split(F.col("text"), " "))).cast("long").alias("total_tokens"),
        davg(F.col("n_chars").cast("double")).alias("avg_chars"),
        F.countDistinct("source").alias("n_sources"),
    )


@register(
    "l04_tfidf",
    oracle="""
    WITH terms AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ), tf AS (
      SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY doc_id, term
    ), df AS (
      SELECT term, count(DISTINCT doc_id) AS df FROM terms GROUP BY term
    ), n AS (SELECT count(*) AS n FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             round(tf.tf * ln(CAST(n.n AS DOUBLE) / df.df), 4) AS score
      FROM tf JOIN df USING (term) CROSS JOIN n
    ), ranked AS (
      SELECT doc_id, term, score,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, term) AS rn
      FROM scored)
    SELECT doc_id, term, CAST(rn AS BIGINT) AS term_rank
    FROM ranked WHERE rn <= 5
    """,
    priority="P2",
)
def l04_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF: top-5 terms per document by tf·ln(N/df). Ranking is on
    the ROUNDED score (tie-broken by term) so last-bit ln() noise can
    never flip the top-k cut between engines; the HASHED columns are
    (doc_id, term, term_rank) only — ln() produces non-terminating
    decimals, so the raw score stays out of the value hash entirely
    (FLOAT RULE, contracts.py).

    Scale: tf is one explode+agg shuffle; df is a term-keyed agg
    (vocab-sized, small); N is a scalar broadcast. The df table
    broadcasts into the tf table — no fact-fact shuffle."""
    d = table(spark, sf_dir, "documents")
    terms = d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("term"))
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = terms.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = d.count()  # scalar; at scale: computed once per pipeline run
    scored = tf.join(F.broadcast(df), "term").select(
        "doc_id",
        "term",
        r4(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("doc_id", "term", F.col("rn").cast("long").alias("term_rank"))
    )


@register(
    "l05_ngram_bigrams",
    oracle="""
    WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents)
    SELECT bigram, count(*) AS cnt
    FROM (
      SELECT unnest(list_transform(range(1, len(t)),
                                   i -> t[i] || ' ' || t[i + 1])) AS bigram
      FROM toks WHERE len(t) >= 2)
    GROUP BY bigram
    """,
    priority="P2",
)
def l05_ngram_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram counts (n-gram extraction): built JVM-side with
    transform-over-sequence — no per-token self-join, no Python."""
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 1),
        lambda i: F.concat(F.element_at(toks, i), F.lit(" "), F.element_at(toks, i + 1)),
    )
    return (
        d.filter(F.size(toks) >= 2)
        .select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("cnt"))
    )


@register(
    "l06_quality_filter",
    oracle="""
    SELECT doc_id, lang, n_chars,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
    FROM documents
    WHERE lang IN ('en', 'de', 'fr')
      AND n_chars BETWEEN 40 AND 2000
      AND len(string_split(text, ' ')) BETWEEN 5 AND 400
    """,
)
def l06_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus quality gate: language allowlist + length and
    token-count bounds — the standard LLM-corpus cleaning step
    (filters push to the scan; the token-count predicate evaluates
    post-scan but before any shuffle)."""
    d = table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.col("text"), " ")).cast("long")
    return (
        d.filter(F.col("lang").isin("en", "de", "fr"))
        .filter(F.col("n_chars").between(40, 2000))
        .filter(n_tokens.between(5, 400))
        .select("doc_id", "lang", "n_chars", n_tokens.alias("n_tokens"))
    )


@register(
    "l07_embed_norm",
    oracle=f"""
    SELECT vec_id, label,
           round({o_norm2("embedding", _DIM)}, 3) AS l2_norm
    FROM embeddings
    """,
    priority="P2",
)
def l07_embed_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector arithmetic: L2 norm per embedding via JVM higher-order
    functions (float→double per element, sequential fold — mirrored
    exactly in the oracle; see functions/vectors.py)."""
    e = table(spark, sf_dir, "embeddings")
    return e.select("vec_id", "label", r3(norm2(F.col("embedding"))).alias("l2_norm"))


@register(
    "l08_knn_query",
    oracle=f"""
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
    SELECT vec_id, round({o_cosine("embedding", "qe", _DIM)}, 3) AS score
    FROM embeddings, q
    WHERE vec_id <> 0
    ORDER BY score DESC, vec_id
    LIMIT 10
    """,
)
def l08_knn_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity search: top-10 cosine neighbors of vec_id=0.

    Brute-force baseline: broadcast the single query vector, one scan,
    TakeOrderedAndProject top-k — already the right plan at any scale
    for single-query lookup (IVF/LSH bucketing only pays off for
    batch kNN joins, see l09). Ranking on the rounded score with
    vec_id tie-break keeps the cut deterministic."""
    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qe"))
    return (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select("vec_id", r3(cosine(F.col("embedding"), F.col("qe"))).alias("score"))
        .orderBy(F.col("score").desc(), F.col("vec_id"))
        .limit(10)
    )


@register(
    "l09_knn_join",
    oracle=f"""
    WITH pairs AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             round({o_cosine("a.embedding", "b.embedding", _DIM)}, 3) AS score
      FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
      WHERE a.vec_id < 20
    ), ranked AS (
      SELECT query_id, neighbor_id, score,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, neighbor_id) AS rn
      FROM pairs)
    SELECT query_id, neighbor_id, score FROM ranked WHERE rn <= 3
    """,
    priority="P2",
)
def l09_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN similarity join: top-3 neighbors for each query vector
    (vec_id < 20).

    The `vec_id < 20` bound is LOAD-BEARING, not incidental: it is
    what makes the broadcast-nested-loop plan legitimate (the query
    side is a small broadcast, so broadcast-cross + per-query top-k
    is exact and shuffle-free on the corpus side), and it is why this
    query sits on the BroadcastNestedLoopJoin allowlist
    (tests/test_plans.py). Do NOT lift the bound here — for query
    sets that scale with the corpus, l19_knn_ivf is the unbounded
    path (IVF coarse quantizer → bounded probe join); LSH bucketing
    (operators/dedup.py's banded join) is the other scale-safe
    candidate generator. Same downstream rank-filter either way."""
    # Guard the broadcast side: this plan is linear in |queries| per
    # corpus row, so a query set beyond broadcast scale silently turns
    # it into an all-pairs scan. The set is bounded STATICALLY by the
    # vec_id filter below, so the check is free (no probe job) and
    # fires the moment someone widens the bound past broadcast scale;
    # l19_knn_ivf is the unbounded path.
    if _KNN_JOIN_QUERY_BOUND > _KNN_JOIN_MAX_QUERIES:
        raise ValueError(
            f"l09_knn_join query bound {_KNN_JOIN_QUERY_BOUND} exceeds the "
            f"broadcast cap {_KNN_JOIN_MAX_QUERIES}; use l19_knn_ivf (IVF "
            "probe join) for query sets that scale with the corpus"
        )
    e = table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < _KNN_JOIN_QUERY_BOUND).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    pairs = (
        e.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            r3(cosine(F.col("embedding"), F.col("qe"))).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("query_id", "neighbor_id", "score")
    )


@register(
    "l10_multimodal",
    oracle=f"""
    SELECT label,
           count(*) AS n_docs,
           {oavg("CAST(n_chars AS DOUBLE)")} AS avg_chars,
           count(DISTINCT lang) AS n_langs
    FROM documents JOIN embeddings ON doc_id = vec_id
    GROUP BY label
    """,
)
def l10_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal join: text metadata ⋈ embedding labels (doc_id =
    vec_id), per-label corpus stats — the join every multimodal
    curation pipeline does between modality tables."""
    d = table(spark, sf_dir, "documents")
    e = table(spark, sf_dir, "embeddings")
    return (
        d.join(e, d.doc_id == e.vec_id)
        .groupBy("label")
        .agg(
            F.count("*").alias("n_docs"),
            davg(F.col("n_chars").cast("double")).alias("avg_chars"),
            F.countDistinct("lang").alias("n_langs"),
        )
    )
