"""§2.L round-3 additions — training-data pipeline operators.

Two operations every large-scale LLM corpus build runs after
filtering/dedup (SURVEY.md §2 round-3 addendum):

* l27 sequence packing — assign each document its position in the
  fixed-capacity token stream a trainer consumes ("concat-and-split"
  packing: documents are laid out in a deterministic total order and
  the stream is cut every CAPACITY tokens).
* l28 benchmark decontamination — flag training documents sharing
  long n-grams with a held-out evaluation set (the train/test
  overlap check; cf. the n-gram overlap decontamination described in
  public LLM reports such as GPT-3/PaLM appendices).

Both are pure DataFrame plans with full DuckDB oracles. No Python
UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_release_spark.catalog import table
from hadoop_release_spark.operators.dedup import o_word_shingles_case, word_shingles
from hadoop_release_spark.operators.rank import global_prefix_sum
from hadoop_release_spark.plans.registry import register

#: l27 — tokens per training sequence. The fixture's whitespace
#: tokenization (consistent with l03/l16's token accounting) stands
#: in for a real BPE count; swapping in a tokenizer UDF changes only
#: the n_tokens expression, not the packing construction.
PACK_CAPACITY = 1024

#: l28 — evaluation-set membership (deterministic fixture split),
#: n-gram length, contamination threshold, and the document-frequency
#: cap above which a gram is considered boilerplate and excluded from
#: matching. One block, mirrored verbatim into the oracle SQL.
EVAL_MOD = 50
DECON_NGRAM_K = 8
DECON_MIN_SHARED = 5
DECON_MAX_GRAM_DF = 1000


@register(
    "l27_sequence_pack",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents
    ), c AS (
      SELECT doc_id, n_tokens,
             sum(n_tokens) OVER (ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) - n_tokens AS cum_before
      FROM t)
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(cum_before // {PACK_CAPACITY} AS BIGINT) AS pack_id,
           CAST(cum_before % {PACK_CAPACITY} AS BIGINT) AS offset_in_pack
    FROM c
    """,
    priority="P2",
)
def l27_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for training: lay documents out in doc_id
    order and cut the concatenated token stream every PACK_CAPACITY
    tokens. Each doc gets (pack_id, offset_in_pack) = where it STARTS;
    a doc crossing a boundary spans packs (concat-and-split
    semantics — no padding waste, the layout every data loader can
    consume by seeking to pack_id*CAPACITY+offset).

    Scale shape: the global ordered cumulative sum is the crux — a
    bare ``sum() OVER (ORDER BY doc_id)`` collapses to ONE partition.
    global_prefix_sum (operators/rank.py) computes it as
    range-partition → parallel per-partition running sums → a
    #partitions-sized offset list broadcast back, so the plan scales
    like TeraSort, not like a single-reducer job."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens")
    )
    packed = global_prefix_sum(d, ["doc_id"], "n_tokens", out_name="cum_before")
    return packed.select(
        "doc_id",
        "n_tokens",
        F.floor(F.col("cum_before") / PACK_CAPACITY).cast("long").alias("pack_id"),
        F.pmod(F.col("cum_before"), F.lit(PACK_CAPACITY)).cast("long").alias(
            "offset_in_pack"
        ),
    )


def _o_l28() -> str:
    # Built from the SAME constants and the SAME shingle SQL generator
    # as the Spark side (o_word_shingles_case), per the shared-block
    # parity rule in operators/dedup.py.
    return f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), sh AS (
      SELECT doc_id, {o_word_shingles_case(DECON_NGRAM_K)} AS g FROM toks
    ), ex AS (
      SELECT doc_id, unnest(g) AS gram FROM sh
    ), tr AS (
      SELECT * FROM ex WHERE doc_id % {EVAL_MOD} != 0
    ), heavy AS (
      SELECT gram FROM (SELECT gram, count(*) AS c FROM tr GROUP BY gram)
      WHERE c > {DECON_MAX_GRAM_DF}
    ), tr2 AS (
      SELECT * FROM tr WHERE gram NOT IN (SELECT gram FROM heavy)
    ), ev AS (
      SELECT * FROM ex WHERE doc_id % {EVAL_MOD} = 0
    ), pairs AS (
      SELECT tr2.doc_id AS train_id, ev.doc_id AS eval_id, count(*) AS n_shared
      FROM tr2 JOIN ev ON tr2.gram = ev.gram
      GROUP BY 1, 2
    ), flags AS (
      SELECT eval_id,
             count(*) AS n_contaminated_train_docs,
             max(n_shared) AS max_shared_ngrams
      FROM pairs WHERE n_shared >= {DECON_MIN_SHARED}
      GROUP BY eval_id)
    SELECT d.doc_id AS eval_doc_id,
           CAST(COALESCE(f.n_contaminated_train_docs, 0) AS BIGINT)
             AS n_contaminated_train_docs,
           CAST(COALESCE(f.max_shared_ngrams, 0) AS BIGINT) AS max_shared_ngrams
    FROM documents d LEFT JOIN flags f ON d.doc_id = f.eval_id
    WHERE d.doc_id % {EVAL_MOD} = 0
    """


@register("l28_decontaminate", oracle=_o_l28(), priority="P2")
def l28_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: per evaluation document, how many
    training documents share ≥ DECON_MIN_SHARED distinct
    DECON_NGRAM_K-word n-grams with it (and the worst overlap). The
    eval set is the deterministic fixture split doc_id % EVAL_MOD = 0;
    in production it is the benchmark corpus.

    Scale shape: candidate generation is ONE shuffle on the gram —
    never doc×doc. The document-frequency pre-filter is the
    load-bearing skew guard: a boilerplate gram appearing in F train
    docs fans out F rows per eval occurrence, so grams with
    df > DECON_MAX_GRAM_DF (a tiny, broadcastable set by definition)
    are excluded from matching before the join — they carry no
    contamination signal and they are exactly the hot keys that would
    skew it. Emits one row per eval doc (zero-filled), so the result
    is never vacuously empty."""
    d = table(spark, sf_dir, "documents")
    grams = d.select(
        "doc_id",
        F.explode(word_shingles(F.col("text"), DECON_NGRAM_K)).alias("gram"),
    )
    is_eval = F.col("doc_id") % EVAL_MOD == 0
    train = grams.filter(~is_eval)
    ev = grams.filter(is_eval).select(
        F.col("doc_id").alias("eval_id"), "gram"
    )

    # word_shingles emits DISTINCT grams per doc, so count(*) per gram
    # is its document frequency. The heavy set is bounded (≤ corpus
    # vocabulary of boilerplate), broadcast anti-join removes it.
    heavy = (
        train.groupBy("gram").count().filter(F.col("count") > DECON_MAX_GRAM_DF)
    )
    train = train.join(F.broadcast(heavy.select("gram")), "gram", "left_anti")

    pairs = (
        train.join(ev, "gram")
        .groupBy(F.col("doc_id").alias("train_id"), "eval_id")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= DECON_MIN_SHARED)
    )
    flags = pairs.groupBy("eval_id").agg(
        F.count("*").alias("n_contaminated_train_docs"),
        F.max("n_shared").alias("max_shared_ngrams"),
    )
    eval_docs = d.filter(is_eval).select(F.col("doc_id").alias("eval_doc_id"))
    return (
        eval_docs.join(flags, eval_docs.eval_doc_id == flags.eval_id, "left")
        .select(
            "eval_doc_id",
            F.coalesce(F.col("n_contaminated_train_docs"), F.lit(0))
            .cast("long")
            .alias("n_contaminated_train_docs"),
            F.coalesce(F.col("max_shared_ngrams"), F.lit(0))
            .cast("long")
            .alias("max_shared_ngrams"),
        )
    )
