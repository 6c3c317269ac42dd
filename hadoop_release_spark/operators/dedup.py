"""Deduplication operators for LLM corpus construction.

Exact dedup is a hash-groupBy (one shuffle on the content hash).
Near-dup detection is MinHash + banded LSH, the standard construction
(Broder 1997; Leskovec/Rajaraman/Ullman ch.3):

  shingle → per-shingle 64-bit hash → H permutation-min signatures →
  split into B bands of R rows → bucket-join on (band, band-hash) →
  verify candidate pairs with exact Jaccard.

Scale analysis (the reason this shape is mandatory at 100 TB):
candidates come only from hash-bucket collisions — one shuffle on
(band_id, band_hash), cost O(N·B) rows — versus the O(N²) all-pairs
join a naive similarity pass would need. Probability a pair with
Jaccard s becomes a candidate: 1-(1-s^R)^B (with H=64, B=16, R=4:
s=0.8 → 0.986; s=0.3 → 0.063) — tunable via bands/rows.

Determinism: hash params are fixed constants derived from a seeded
LCG — no runtime randomness (SURVEY.md §7 hard-part #4).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Mersenne prime 2^31-1; per-shingle hashes are reduced mod P first
#: so a*h+b stays far below int64 overflow (ANSI mode errors on it).
_P = 2_147_483_647


def _hash_params(num_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs from a fixed LCG — reproducible
    across runs, sessions, and cluster sizes."""
    params, state = [], seed
    for _ in range(num_hashes):
        state = (state * 1103515245 + 12345) % (2**31)
        a = state % (_P - 1) + 1
        state = (state * 1103515245 + 12345) % (2**31)
        b = state % _P
        params.append((a, b))
    return params


def word_shingles(text: Column, k: int = 3) -> Column:
    """k-word shingles of a whitespace-tokenized text column."""
    toks = F.split(text, " ")
    n = F.size(toks)
    make = F.transform(
        F.sequence(F.lit(1), n - (k - 1)),
        lambda i: F.array_join(F.slice(toks, i, k), " "),
    )
    return F.when(n >= k, F.array_distinct(make)).otherwise(
        F.array(F.array_join(toks, " "))
    )


def minhash_signature(shingles: Column, num_hashes: int = 64) -> Column:
    """MinHash signature: for each permutation i, min over shingles of
    (a_i·h + b_i) mod P, with h = xxhash64(shingle) mod P."""
    hashes = F.transform(shingles, lambda s: F.pmod(F.xxhash64(s), F.lit(_P)))
    params = F.array(
        *[
            F.struct(F.lit(a).alias("a"), F.lit(b).alias("b"))
            for a, b in _hash_params(num_hashes)
        ]
    )
    return F.transform(
        params,
        lambda p: F.array_min(
            F.transform(hashes, lambda h: F.pmod(p["a"] * h + p["b"], F.lit(_P)))
        ),
    )


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b) with exact Jaccard ≥ τ.

    Returns columns: id_a, id_b, jaccard (rounded 3dp).
    """
    rows_per_band = num_hashes // bands
    base = df.select(
        F.col(id_col).alias("__id"),
        word_shingles(F.col(text_col), shingle_k).alias("__shingles"),
    ).withColumn("__sig", minhash_signature(F.col("__shingles"), num_hashes))
    # The shingle sets are needed twice (banding above, verification
    # below); persist so the sketching pass runs once.
    base = base.persist()

    # Candidate generation on SLIM rows only — (id, band, bucket).
    # Never ship the shingle arrays through the band shuffle: payload
    # width through a shuffle is the thing that breaks at 100 TB.
    banded = base.select(
        "__id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.hash(F.slice(F.col("__sig"), b * rows_per_band + 1, rows_per_band)),
            )
        ).alias("__band", "__bucket"),
    )

    left = banded.alias("a")
    right = banded.alias("b")
    candidate_ids = (
        left.join(
            right,
            (F.col("a.__band") == F.col("b.__band"))
            & (F.col("a.__bucket") == F.col("b.__bucket"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )

    # Verification: re-attach shingles only for surviving pairs (two
    # key-joins against the persisted sketch table).
    shingles = base.select("__id", "__shingles")
    candidates = (
        candidate_ids.join(
            shingles.select(
                F.col("__id").alias("id_a"), F.col("__shingles").alias("sh_a")
            ),
            "id_a",
        )
        .join(
            shingles.select(
                F.col("__id").alias("id_b"), F.col("__shingles").alias("sh_b")
            ),
            "id_b",
        )
    )

    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b"))).cast("double")
    union = F.size(F.array_union(F.col("sh_a"), F.col("sh_b"))).cast("double")
    return (
        candidates.withColumn("jaccard", F.round(inter / union, 3))
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )


def connected_components_min_label(
    nodes: DataFrame,
    pairs: DataFrame,
    id_col: str = "__id",
    max_iters: int = 10,
) -> DataFrame:
    """Connected components over near-dup pairs by iterative min-label
    propagation: every node's label converges to the smallest id in
    its component. Returns (id_col, component).

    Near-dup components have tiny diameter (dup clusters are cliques
    or short chains), so propagation converges in a few rounds —
    each round is one join + one min-aggregation, fully distributed;
    only the converged-yet? count reaches the driver. For general
    billion-edge graphs use the large-star/small-star algorithm
    (Kiveris et al.) — same join primitives, fewer rounds.
    """
    # Persist the SLIM symmetric edge list: every iteration's join and
    # the convergence count re-read it, and ``pairs`` is typically an
    # expensive pipeline (the full LSH candidate generation) that must
    # not re-run per round. Released before return — the final labels
    # are cache-materialized by the last convergence count, so the
    # returned plan never reaches back through the edges.
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .union(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .persist()
    )
    labels = nodes.select(F.col(id_col).alias("node")).withColumn(
        "component", F.col("node")
    ).persist()

    for _ in range(max_iters):
        neighbor = (
            edges.join(labels, edges.dst == labels.node)
            .select(F.col("src").alias("node"), "component")
        )
        new_labels = (
            labels.select("node", "component")
            .union(neighbor)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .persist()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    return labels.withColumnRenamed("node", id_col)
