"""§2.M (addendum) — multimodal binary-column pipeline.

Binary payloads + mapInPandas decode stages with REAL uncompressed
codecs (24-bit BMP, PCM16 WAV — public specs, stdlib only; see
operators/multimodal.py; compressed formats raise clearly, the
container has no image/audio/video libraries). Every m-query is
FULL-ORACLE: fixture payloads are built from md5-digest pixels /
known-length tones, so the oracle replays the construction in SQL
and the hash gate verifies the real decode path end-to-end; decoded
byte checksums are additionally crc32-pinned in pytest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_release_spark.catalog import table
from hadoop_release_spark.operators.multimodal import (
    attach_audio_payload,
    audio_zero_crossings,
    image_ahash,
    attach_video_payload,
    attach_fake_payload,
    video_scene_cuts,
    attach_image_payload,
    extract_image_features,
    resize_image_features,
    sample_audio_frames,
    sample_video_frames,
)
from hadoop_release_spark.plans.registry import register


@register(
    "m01_binary_metadata",
    oracle="""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_bytes,
           lang
    FROM documents
    """,
)
def m01_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary column construction + metadata projection: encode the
    payload, measure it JVM-side (octet_length), carry typed metadata
    alongside. The payload column is pruned from any plan not
    touching it — the core storage property of multimodal tables."""
    d = attach_fake_payload(table(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        "lang",
    )


@register(
    "m02_image_features",
    oracle="""
    WITH dims AS (
      SELECT doc_id,
             n_chars % 13 + 4 AS width,
             n_chars % 7 + 4 AS height
      FROM documents)
    SELECT doc_id,
           CAST(54 + height * (((width * 3 + 3) // 4) * 4) AS BIGINT) AS n_bytes,
           CAST(width AS INTEGER) AS width,
           CAST(height AS INTEGER) AS height,
           CAST(3 AS INTEGER) AS channels
    FROM dims
    """,
    priority="P2",
)
def m02_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image decode + feature extraction via Arrow-batched
    mapInPandas: payloads are genuine 24-bit BMPs and the extractor
    runs a REAL stdlib BMP decoder. ORACLE-CHECKED: the payload
    builder derives shape from doc metadata, so the oracle states the
    expected decode results (including the BMP row-padding formula in
    n_bytes) and the hash gate validates the real decode end-to-end.
    The pixel crc32 (no SQL equivalent) stays on the operator and is
    pinned by the codec round-trip pytests."""
    d = attach_image_payload(table(spark, sf_dir, "documents"))
    return extract_image_features(d).select(
        "doc_id", "n_bytes", "width", "height", "channels"
    )


@register(
    "m04_image_resize",
    oracle="""
    WITH dims AS (
      SELECT doc_id,
             n_chars % 13 + 4 AS w,
             n_chars % 7 + 4 AS h,
             md5(CAST(doc_id AS VARCHAR)) AS hex
      FROM documents
    ), px AS (
      SELECT doc_id, w, h, hex, w // 2 AS nw, h // 2 AS nh,
             unnest(range(0, (w // 2) * (h // 2))) AS i
      FROM dims
    ), pos AS (
      SELECT doc_id, nw, nh, hex,
             ((2 * (i // nw)) * w + 2 * (i % nw)) * 3 AS p
      FROM px)
    SELECT doc_id,
           CAST(nw AS INTEGER) AS new_width,
           CAST(nh AS INTEGER) AS new_height,
           CAST(sum(('0x' || substring(hex, (p % 16) * 2 + 1, 2))::INT) AS BIGINT) AS sum_r,
           CAST(sum(('0x' || substring(hex, ((p + 1) % 16) * 2 + 1, 2))::INT) AS BIGINT) AS sum_g,
           CAST(sum(('0x' || substring(hex, ((p + 2) % 16) * 2 + 1, 2))::INT) AS BIGINT) AS sum_b
    FROM pos GROUP BY doc_id, nw, nh
    """,
    priority="P2",
)
def m04_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image resize (nearest-neighbor 2× downsample) through the full
    real decode path: BMP payload → mapInPandas decode → numpy strided
    resample → per-channel integer pixel sums. ORACLE-CHECKED
    end-to-end: fixture pixels are md5(doc_id) digest bytes cycled
    through the RGB buffer, so the oracle replays the exact sampled
    positions ((2x,2y) of a w×h image, p = (2y·w + 2x)·3) and sums the
    same digest bytes in SQL — the hash gate validates decode,
    geometry, and resampling arithmetic together. Integer sums, not
    float means, keep it on the hash contract (FLOAT RULE)."""
    d = attach_image_payload(table(spark, sf_dir, "documents"))
    return resize_image_features(d)


@register(
    "m03_audio_frames",
    oracle="""
    SELECT doc_id, CAST(unnest(range(0, least(4, 3 + doc_id % 4))) AS INTEGER)
             AS frame_idx
    FROM documents
    """,
    priority="P2",
)
def m03_audio_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio frame sampling: REAL PCM16 WAV decode, then 1 payload →
    N fixed-size sample frames through mapInPandas (the row-expanding
    batch shape). ORACLE-CHECKED: WAV lengths cycle 192/256/320/384
    samples by construction, so the oracle knows each doc's frame
    count; the per-frame PCM crc32 stays pytest-pinned."""
    d = attach_audio_payload(table(spark, sf_dir, "documents"))
    return sample_audio_frames(d).select("doc_id", "frame_idx")


@register(
    "m05_video_framesample",
    oracle="""
    WITH dims AS (
      SELECT doc_id, n_chars % 9 + 4 AS w, n_chars % 5 + 4 AS h,
             doc_id % 5 + 2 AS nf
      FROM documents
    ), fr AS (
      SELECT doc_id, w, h, unnest(range(0, nf, 2)) AS frame_idx FROM dims
    ), px AS (
      SELECT doc_id, w, h, frame_idx,
             md5(CAST(doc_id AS VARCHAR) || ':' || CAST(frame_idx AS VARCHAR))
               AS hex,
             unnest(range(0, w * h)) AS i
      FROM fr
    )
    SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
           CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
           CAST(sum(('0x' || substring(hex, ((3 * i) % 16) * 2 + 1, 2))::INT)
                AS BIGINT) AS sum_r,
           CAST(sum(('0x' || substring(hex, ((3 * i + 1) % 16) * 2 + 1, 2))::INT)
                AS BIGINT) AS sum_g,
           CAST(sum(('0x' || substring(hex, ((3 * i + 2) % 16) * 2 + 1, 2))::INT)
                AS BIGINT) AS sum_b
    FROM px GROUP BY doc_id, frame_idx, w, h
    """,
    priority="P2",
)
def m05_video_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling: SVID uncompressed clip (2-6 real BMP
    frames per doc) → container parse → every-2nd-frame stride sample
    → REAL per-frame BMP decode → per-channel integer pixel sums,
    all inside one Arrow-batched mapInPandas stage (1 clip → N
    sampled-frame rows, the m03 row-expansion shape on a nested
    container). ORACLE-CHECKED end-to-end: frame pixels are
    md5(doc_id:frame) digest bytes cycled through the RGB buffer, so
    the oracle replays the sampled frame indices and digest-byte
    sums in SQL — validating container framing, stride selection,
    BMP decode, and channel arithmetic together. Compressed video
    raises NotImplementedError (no libav here; the container format
    is the extension point).

    Scale shape: clips stream through Python in columnar batches;
    metadata predicates (doc_id, n_chars) are evaluated BEFORE the
    payload stage so pruning keeps clip bytes out of plans that
    don't decode. Frame sampling is per-row work — embarrassingly
    parallel, no shuffle; size maxPartitionBytes so one task's clip
    batch fits executor memory (module docstring rule)."""
    d = attach_video_payload(table(spark, sf_dir, "documents"))
    return sample_video_frames(d)


@register(
    "m06_image_phash",
    oracle="""
    WITH docs AS (
      SELECT doc_id, n_chars % 13 + 4 AS w, n_chars % 7 + 4 AS h,
             md5(CAST(doc_id AS VARCHAR)) AS hex
      FROM documents
    ), cells AS (
      SELECT doc_id, w, h, i.i AS idx,
             3 * ((((i.i // 8) * h) // 8) * w + (((i.i % 8) * w) // 8)) AS p,
             hex
      FROM docs, unnest(range(0, 64)) AS i(i)
    ), gray AS (
      SELECT doc_id, w, h, idx,
        ( (16*(strpos('0123456789abcdef',
                      substring(hex, 2*(p % 16)+1, 1))-1)
            + strpos('0123456789abcdef',
                     substring(hex, 2*(p % 16)+2, 1))-1)
        + (16*(strpos('0123456789abcdef',
                      substring(hex, 2*((p+1) % 16)+1, 1))-1)
            + strpos('0123456789abcdef',
                     substring(hex, 2*((p+1) % 16)+2, 1))-1)
        + (16*(strpos('0123456789abcdef',
                      substring(hex, 2*((p+2) % 16)+1, 1))-1)
            + strpos('0123456789abcdef',
                     substring(hex, 2*((p+2) % 16)+2, 1))-1)
        ) // 3 AS g
      FROM cells
    ), tot AS (
      SELECT doc_id, CAST(sum(g) AS BIGINT) AS s FROM gray GROUP BY doc_id
    )
    SELECT g.doc_id,
           CAST(max(g.w) AS INTEGER) AS width,
           CAST(max(g.h) AS INTEGER) AS height,
           CAST(sum(CASE WHEN g.idx < 32 AND 64*g.g > t.s
                         THEN (CAST(1 AS BIGINT) << g.idx)
                         ELSE 0 END) AS BIGINT) AS ahash_lo,
           CAST(sum(CASE WHEN g.idx >= 32 AND 64*g.g > t.s
                         THEN (CAST(1 AS BIGINT) << (g.idx - 32))
                         ELSE 0 END) AS BIGINT) AS ahash_hi
    FROM gray g JOIN tot t ON g.doc_id = t.doc_id
    GROUP BY g.doc_id
    """,
    priority="P2",
)
def m06_image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual average-hash (aHash) per image — the image
    NEAR-dedup primitive (l01-for-pixels is exact byte dedup; this
    survives resize/re-encode: images hash to the same 64 bits when
    their 8×8 gray thumbnails threshold identically; Hamming
    distance ≤ k = near-duplicate). Downstream the 64 bits band into
    4×16-bit buckets exactly like l11's SimHash bands — candidate
    pairs come from bucket joins, never all-pairs.

    FULL-ORACLE like m02: the fixture payload builder derives pixels
    from md5(doc_id) repeated, so the oracle replays construction +
    nearest-neighbor sampling + the ALL-INTEGER threshold
    (bit ⇔ 64·gray > Σgray — no float mean) in pure SQL, and the
    hash gate verifies the REAL BMP decode + numpy downsample path
    bit-for-bit. The planted-duplicate pytest proves equal payloads
    → equal hashes and a small perturbation → small Hamming gap.

    Scale shape: payload decode is the one unavoidable Python stage
    (Arrow-batched mapInPandas, the m02 posture); everything after
    is 5 slim integer columns. Metadata-only predicates must run
    BEFORE this stage so pruned payloads never cross Arrow."""
    d = attach_image_payload(table(spark, sf_dir, "documents"))
    return image_ahash(d)


@register(
    "m07_audio_fingerprint",
    oracle="""
    WITH docs AS (
      SELECT doc_id,
             200 + (doc_id % 32) * 25 AS f,
             192 + (doc_id % 4) * 64 AS n
      FROM documents
    ), samp AS (
      SELECT doc_id, f, unnest(range(0, n)) AS i FROM docs
    ), sgn AS (
      -- Exact integer sign of sample i = int(12000·sin(2π·f·i/8000)):
      -- with m = (2·f·i) mod 16000, the sample is 0 IFF m is a
      -- multiple of 8000 (θ = kπ: |sin| < 1e-9 at double precision,
      -- truncates to 0; every other m keeps |sample| ≥ 2 — the zero
      -- band is provably narrower than one integer step of m).
      SELECT doc_id, i, CAST(i // 64 AS INT) AS frame_idx,
             CASE WHEN (2 * f * i) % 8000 = 0 THEN 0
                  WHEN (2 * f * i) % 16000 < 8000 THEN 1
                  ELSE -1 END AS sg
      FROM samp
    ), pairs AS (
      SELECT doc_id, frame_idx, i, sg,
             lag(sg) OVER (PARTITION BY doc_id ORDER BY i) AS prev
      FROM sgn
    )
    SELECT doc_id, frame_idx,
           CAST(coalesce(sum(CASE WHEN i % 64 <> 0 AND sg * prev = -1
                                  THEN 1 ELSE 0 END), 0) AS BIGINT)
             AS zero_crossings
    FROM pairs GROUP BY doc_id, frame_idx
    """,
    priority="P2",
)
def m07_audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio fingerprinting: REAL PCM16 WAV decode → per-frame
    zero-crossing counts (the classic voicing/pitch feature; the
    per-clip count VECTOR is the retrieval fingerprint). FULL hash
    oracle for the decode path — the fixture tones are sines whose
    sample SIGNS are integer-decidable ((2·f·i) mod arithmetic, see
    the oracle comment), so the oracle derives every frame's exact
    crossing count without trusting the decoder: a byte-order or
    offset bug in decode_wav shifts signs and fails the hash.
    Convention: strict +/− flips between adjacent samples count;
    zeros break adjacency; only intra-frame pairs (i % 64 ≠ 0) and
    whole frames are emitted.

    Scale shape: Arrow-batched mapInPandas (media decode is the one
    legitimately-Python stage, same as m02-m06); one narrow pass, no
    shuffle — the groupBy lives inside the frame loop per payload."""
    d = attach_audio_payload(table(spark, sf_dir, "documents"))
    return audio_zero_crossings(d)


@register(
    "m08_video_scene_cut",
    oracle="""
    WITH dims AS (
      SELECT doc_id, n_chars % 9 + 4 AS w, n_chars % 5 + 4 AS h,
             doc_id % 5 + 2 AS nf
      FROM documents
    ), fr AS (
      SELECT doc_id, w * h * 3 AS n, unnest(range(1, nf)) AS f FROM dims
    ), k AS (
      SELECT unnest(range(0, 16)) AS k
    ), diffs AS (
      -- frame pixels are md5(doc:frame) digests tiled to n bytes, so
      -- the full-frame |diff| sum collapses to 16 digest-byte terms
      -- weighted by how often each digest position occurs (n//16 +1
      -- for the first n%16 positions) — exact integers end-to-end.
      SELECT d.doc_id, d.f, d.n,
             sum( (d.n // 16 + CASE WHEN k.k < d.n % 16 THEN 1 ELSE 0 END)
                * abs( ('0x' || substring(md5(CAST(d.doc_id AS VARCHAR) || ':' || CAST(d.f AS VARCHAR)), k.k * 2 + 1, 2))::INT
                     - ('0x' || substring(md5(CAST(d.doc_id AS VARCHAR) || ':' || CAST(d.f - 1 AS VARCHAR)), k.k * 2 + 1, 2))::INT ) )
               AS diff_total
      FROM fr d CROSS JOIN k
      GROUP BY d.doc_id, d.f, d.n
    )
    SELECT doc_id, CAST(f AS INT) AS frame_idx,
           CAST(diff_total AS BIGINT) AS diff_total,
           diff_total * 3 > 256 * n AS is_cut
    FROM diffs
    """,
    priority="P2",
)
def m08_video_scene_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video scene-cut detection: REAL container parse + BMP decode
    of every frame, total absolute pixel difference between
    consecutive frames, integer cut threshold (mean byte diff >
    256/3 — the uniform-random expectation — expressed as
    ``diff*3 > 256*n`` so no float ever appears). ORACLE-CHECKED
    end-to-end: fixture frame pixels are md5-digest bytes tiled to
    frame size, so the full-frame diff collapses to 16 weighted
    digest-byte terms the oracle computes without decoding anything
    — a frame-order, byte-order, or padding bug in the decode path
    changes the sums and fails the hash.

    Scale shape: Arrow-batched mapInPandas (media decode = the
    legitimately-Python stage); payloads never shuffle; output is 4
    integer/boolean columns per frame pair. The diff needs only two
    frames in memory at once (streaming decode posture)."""
    d = attach_video_payload(table(spark, sf_dir, "documents"))
    return video_scene_cuts(d)


#: m09: Hamming radius for "near-duplicate" on the 64-bit aHash.
_M09_NEAR_BITS = 6


def _o_m09_ctes() -> str:
    """Shared m09/m12 CTE chain (docs → canon dims → md5 pixel grays
    → aHash halves → 4×16-bit bands → candidate pairs): ONE
    definition of the image-hash arithmetic, so the pair op (m09)
    and the survivor op (m12) cannot disagree on what an image
    near-duplicate is."""
    return """docs AS (
      SELECT doc_id,
             CASE WHEN doc_id % 10 = 9 THEN doc_id - 1 ELSE doc_id END
               AS canon
      FROM documents
    ), dims AS (
      SELECT doc_id, canon % 13 + 4 AS w, canon % 7 + 4 AS h,
             md5(CAST(canon AS VARCHAR)) AS hex
      FROM docs
    ), cells AS (
      SELECT doc_id, w, h, i.i AS idx,
             3 * ((((i.i // 8) * h) // 8) * w + (((i.i % 8) * w) // 8)) AS p,
             hex
      FROM dims, unnest(range(0, 64)) AS i(i)
    ), gray AS (
      SELECT doc_id, idx,
        ( (16*(strpos('0123456789abcdef',
                      substring(hex, 2*(p % 16)+1, 1))-1)
            + strpos('0123456789abcdef',
                     substring(hex, 2*(p % 16)+2, 1))-1)
        + (16*(strpos('0123456789abcdef',
                      substring(hex, 2*((p+1) % 16)+1, 1))-1)
            + strpos('0123456789abcdef',
                     substring(hex, 2*((p+1) % 16)+2, 1))-1)
        + (16*(strpos('0123456789abcdef',
                      substring(hex, 2*((p+2) % 16)+1, 1))-1)
            + strpos('0123456789abcdef',
                     substring(hex, 2*((p+2) % 16)+2, 1))-1)
        ) // 3 AS g
      FROM cells
    ), tot AS (
      SELECT doc_id, CAST(sum(g) AS BIGINT) AS s FROM gray GROUP BY doc_id
    ), hashes AS (
      SELECT g.doc_id,
             CAST(sum(CASE WHEN g.idx < 32 AND 64*g.g > t.s
                           THEN (CAST(1 AS BIGINT) << g.idx)
                           ELSE 0 END) AS BIGINT) AS lo,
             CAST(sum(CASE WHEN g.idx >= 32 AND 64*g.g > t.s
                           THEN (CAST(1 AS BIGINT) << (g.idx - 32))
                           ELSE 0 END) AS BIGINT) AS hi
      FROM gray g JOIN tot t ON g.doc_id = t.doc_id
      GROUP BY g.doc_id
    ), banded AS (
      SELECT doc_id, b.b AS band,
             CASE b.b WHEN 0 THEN lo % 65536
                      WHEN 1 THEN lo // 65536
                      WHEN 2 THEN hi % 65536
                      ELSE hi // 65536 END AS bucket
      FROM hashes, unnest(range(0, 4)) AS b(b)
    ), cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.bucket = b.bucket
       AND a.doc_id < b.doc_id
    )"""


@register(
    "m09_phash_near_dup",
    oracle=f"""
    WITH {_o_m09_ctes()}
    SELECT c.doc_a, c.doc_b,
           CAST(bit_count(xor(ha.lo, hb.lo))
                + bit_count(xor(ha.hi, hb.hi)) AS BIGINT) AS hamming,
           CAST(CASE WHEN bit_count(xor(ha.lo, hb.lo))
                          + bit_count(xor(ha.hi, hb.hi))
                          <= {_M09_NEAR_BITS}
                     THEN 1 ELSE 0 END AS BIGINT) AS is_near
    FROM cand c
    JOIN hashes ha ON c.doc_a = ha.doc_id
    JOIN hashes hb ON c.doc_b = hb.doc_id
    """,
    priority="P2",
)
def m09_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-duplicate candidate pairs — l11/l12's SimHash-band
    layout applied to m06's perceptual aHash, closing the multimodal
    dedup loop: REAL BMP decode → 64-bit aHash → 4×16-bit bands →
    bucket self-join candidates → exact Hamming verify
    (bit_count(xor) on the two 32-bit halves), emitting every
    candidate with its distance and an is_near ≤ {{radius}} flag.
    The fixture payload plants byte-identical images on ~10% of docs
    (id ending in 9 carries its predecessor's image), so true
    duplicates (Hamming 0, all bands collide) and random band
    collisions (high Hamming) both appear — the flag discriminates.

    Scale shape: decode runs once per image in the Arrow-batched
    mapInPandas stage (the m06 posture); after it only 5 integer
    columns exist. The band exchange carries slim (doc_id, band,
    bucket) rows — never pixels, never payloads (the l02/l11 LSH
    invariant) — and the verify join re-attaches two bigints per
    side. All-pairs never happens: candidates are bucket-scoped,
    64-bit-hash re-use of the banding math is pure integer
    arithmetic."""
    from hadoop_release_spark.operators.multimodal import (
        attach_image_payload_canon,
        image_ahash,
    )

    d = attach_image_payload_canon(
        table(spark, sf_dir, "documents").select("doc_id")
    )
    hashes = image_ahash(d).select("doc_id", "ahash_lo", "ahash_hi")
    # hashes feeds the band explode and both verify sides; persist so
    # the Python decode stage runs once (released by the wrapper).
    hashes = hashes.persist()
    banded = hashes.select(
        "doc_id",
        F.posexplode(
            F.array(
                F.expr("ahash_lo % 65536"),
                F.expr("ahash_lo DIV 65536"),
                F.expr("ahash_hi % 65536"),
                F.expr("ahash_hi DIV 65536"),
            )
        ).alias("band", "bucket"),
    )
    a = banded.select(
        F.col("doc_id").alias("doc_a"), "band", "bucket"
    )
    b = banded.select(
        F.col("doc_id").alias("doc_b"), "band", "bucket"
    )
    cand = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    ha = hashes.select(
        F.col("doc_id").alias("doc_a"),
        F.col("ahash_lo").alias("lo_a"),
        F.col("ahash_hi").alias("hi_a"),
    )
    hb = hashes.select(
        F.col("doc_id").alias("doc_b"),
        F.col("ahash_lo").alias("lo_b"),
        F.col("ahash_hi").alias("hi_b"),
    )
    hamming = F.expr("bit_count(lo_a ^ lo_b) + bit_count(hi_a ^ hi_b)").cast(
        "long"
    )
    return (
        cand.join(ha, "doc_a")
        .join(hb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            hamming.alias("hamming"),
            F.when(hamming <= _M09_NEAR_BITS, 1)
            .otherwise(0)
            .cast("long")
            .alias("is_near"),
        )
    )


def _o_m10_ctes() -> str:
    """m10's oracle CTE chain (decode replay -> frame aHashes ->
    fingerprint sets -> shared counts + sizes), reusable by the m13
    survivor closure (the _o_m09_ctes discipline)."""
    return """docs AS (
      SELECT doc_id,
             CASE WHEN doc_id % 10 = 9 THEN doc_id - 1 ELSE doc_id END
               AS canon
      FROM documents
    ), meta AS (
      SELECT doc_id, canon,
             canon % 9 + 4 AS w, canon % 5 + 4 AS h,
             canon % 5 + 2 AS n_frames
      FROM docs
    ), sampled AS (
      SELECT doc_id, canon, w, h, f.f AS fidx,
             md5(CAST(canon AS VARCHAR) || ':' || CAST(f.f AS VARCHAR))
               AS hex
      FROM meta, unnest(range(0, n_frames)) AS f(f)
      WHERE f.f % 2 = 0
    ), cells AS (
      SELECT doc_id, fidx, w, h, i.i AS idx,
             3 * ((((i.i // 8) * h) // 8) * w + (((i.i % 8) * w) // 8)) AS p,
             hex
      FROM sampled, unnest(range(0, 64)) AS i(i)
    ), gray AS (
      SELECT doc_id, fidx, idx,
        ( (16*(strpos('0123456789abcdef',
                      substring(hex, 2*(p % 16)+1, 1))-1)
            + strpos('0123456789abcdef',
                     substring(hex, 2*(p % 16)+2, 1))-1)
        + (16*(strpos('0123456789abcdef',
                      substring(hex, 2*((p+1) % 16)+1, 1))-1)
            + strpos('0123456789abcdef',
                     substring(hex, 2*((p+1) % 16)+2, 1))-1)
        + (16*(strpos('0123456789abcdef',
                      substring(hex, 2*((p+2) % 16)+1, 1))-1)
            + strpos('0123456789abcdef',
                     substring(hex, 2*((p+2) % 16)+2, 1))-1)
        ) // 3 AS g
      FROM cells
    ), tot AS (
      SELECT doc_id, fidx, CAST(sum(g) AS BIGINT) AS s
      FROM gray GROUP BY doc_id, fidx
    ), hashes AS (
      SELECT g.doc_id, g.fidx,
             CAST(sum(CASE WHEN g.idx < 32 AND 64*g.g > t.s
                           THEN (CAST(1 AS BIGINT) << g.idx)
                           ELSE 0 END) AS BIGINT) AS lo,
             CAST(sum(CASE WHEN g.idx >= 32 AND 64*g.g > t.s
                           THEN (CAST(1 AS BIGINT) << (g.idx - 32))
                           ELSE 0 END) AS BIGINT) AS hi
      FROM gray g JOIN tot t ON g.doc_id = t.doc_id AND g.fidx = t.fidx
      GROUP BY g.doc_id, g.fidx
    ), fps AS (
      SELECT DISTINCT doc_id, lo, hi FROM hashes
    ), sizes AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS nf
      FROM fps GROUP BY doc_id
    ), shared AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(count(*) AS BIGINT) AS shared_frames
      FROM fps a JOIN fps b ON a.lo = b.lo AND a.hi = b.hi
                           AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )"""


@register(
    "m10_video_near_dup",
    oracle=f"""
    WITH {_o_m10_ctes()}
    SELECT s.doc_a, s.doc_b, s.shared_frames,
           za.nf AS n_a, zb.nf AS n_b,
           CAST(s.shared_frames AS DOUBLE)
           / CAST(za.nf + zb.nf - s.shared_frames AS DOUBLE) AS jaccard
    FROM shared s
    JOIN sizes za ON s.doc_a = za.doc_id
    JOIN sizes zb ON s.doc_b = zb.doc_id
    """,
    priority="P2",
)
def m10_video_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video near-duplicate pairs by FRAME-FINGERPRINT overlap — the
    content-ID primitive: each clip becomes the SET of its sampled
    frames' perceptual aHashes (m06's hash over m05's stride
    sampling), candidate pairs share at least one exact frame hash,
    and the score is set Jaccard. Hash equality IS the LSH here —
    re-encoded copies of a clip collide frame-by-frame. The fixture
    plants duplicate clips with the m09 canon-id rule (~10% of docs
    carry their predecessor's clip → Jaccard 1 pairs), while
    unrelated clips surface only through rare thumbnail-hash
    collisions (low Jaccard) — the score separates them.

    Scale shape: decode + per-frame hashing is ONE Arrow-batched
    mapInPandas pass (payloads never shuffle — the m06/m09
    invariant); after it a clip is ≤ n_frames rows of four integers.
    The ONLY join is keyed on the 64-bit frame hash (map-side
    combined distinct first), so work is Σ|hash bucket|² over
    near-singleton buckets — never clip×clip. Sizes re-aggregate
    the fingerprint table; jaccard is one IEEE division over exact
    counts (d22 rule)."""
    from hadoop_release_spark.operators.multimodal import (
        attach_video_payload_canon,
        video_frame_ahashes,
    )

    d = attach_video_payload_canon(
        table(spark, sf_dir, "documents").select("doc_id")
    )
    fps = (
        video_frame_ahashes(d)
        .select("doc_id", F.col("ahash_lo").alias("lo"), F.col("ahash_hi").alias("hi"))
        .distinct()
    )
    # fps feeds both pair sides and the size table; persist so the
    # Python decode stage runs once (released by the wrapper).
    fps = fps.persist()
    sizes = fps.groupBy("doc_id").agg(F.count("*").cast("long").alias("nf"))
    a = fps.select(F.col("doc_id").alias("doc_a"), "lo", "hi")
    b = fps.select(F.col("doc_id").alias("doc_b"), "lo", "hi")
    shared = (
        a.join(b, ["lo", "hi"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("long").alias("shared_frames"))
    )
    za = sizes.select(F.col("doc_id").alias("doc_a"), F.col("nf").alias("n_a"))
    zb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("nf").alias("n_b"))
    return (
        shared.join(za, "doc_a")
        .join(zb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "shared_frames",
            "n_a",
            "n_b",
            (
                F.col("shared_frames").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("shared_frames")).cast(
                    "double"
                )
            ).alias("jaccard"),
        )
    )


def _o_m11_ctes() -> str:
    """m11's oracle CTE chain (PCM replay -> zero-crossing frames ->
    3-frame shingles -> shared counts + sizes), reusable by the m14
    survivor closure."""
    return """docs AS (
      SELECT doc_id,
             200 + (doc_id % 32) * 25 AS f,
             192 + (doc_id % 4) * 64 AS n
      FROM documents
    ), samp AS (
      SELECT doc_id, f, unnest(range(0, n)) AS i FROM docs
    ), sgn AS (
      SELECT doc_id, i, CAST(i // 64 AS INT) AS frame_idx,
             CASE WHEN (2 * f * i) % 8000 = 0 THEN 0
                  WHEN (2 * f * i) % 16000 < 8000 THEN 1
                  ELSE -1 END AS sg
      FROM samp
    ), pairs AS (
      SELECT doc_id, frame_idx, i, sg,
             lag(sg) OVER (PARTITION BY doc_id ORDER BY i) AS prev
      FROM sgn
    ), frames AS (
      SELECT doc_id, frame_idx,
             CAST(coalesce(sum(CASE WHEN i % 64 <> 0 AND sg * prev = -1
                                    THEN 1 ELSE 0 END), 0) AS BIGINT)
               AS zc
      FROM pairs GROUP BY doc_id, frame_idx
    ), sh AS (
      SELECT a.doc_id,
             md5(CAST(a.zc AS VARCHAR) || ',' || CAST(b.zc AS VARCHAR)
                 || ',' || CAST(c.zc AS VARCHAR)) AS key
      FROM frames a
      JOIN frames b ON a.doc_id = b.doc_id
                   AND b.frame_idx = a.frame_idx + 1
      JOIN frames c ON a.doc_id = c.doc_id
                   AND c.frame_idx = a.frame_idx + 2
    ), fps AS (
      SELECT DISTINCT doc_id, key FROM sh
    ), sizes AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS ns
      FROM fps GROUP BY doc_id
    ), shared AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(count(*) AS BIGINT) AS shared_shingles
      FROM fps a JOIN fps b ON a.key = b.key AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )"""


@register(
    "m11_audio_near_dup",
    oracle=f"""
    WITH {_o_m11_ctes()}
    SELECT s.doc_a, s.doc_b, s.shared_shingles,
           za.ns AS n_a, zb.ns AS n_b,
           CAST(s.shared_shingles AS DOUBLE)
           / CAST(za.ns + zb.ns - s.shared_shingles AS DOUBLE) AS jaccard
    FROM shared s
    JOIN sizes za ON s.doc_a = za.doc_id
    JOIN sizes zb ON s.doc_b = zb.doc_id
    """,
    priority="P2",
)
def m11_audio_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-duplicate pairs by zero-crossing SHINGLE overlap —
    the constellation-matching idea (Wang 2003) reduced to its
    deterministic core, completing the modality-dedup triple (m09
    images, m10 video, m11 audio): each clip's per-frame
    zero-crossing sequence (m07's fingerprint) shingles into
    3-frame md5 keys; clips sharing a shingle are candidates; the
    score is shingle-set Jaccard. The m07 fixture's tone classes
    (freq = canon of doc_id mod 32, length mod 4) make distinct docs
    carry IDENTICAL audio naturally — Jaccard-1 groups the operator
    must surface, plus partial overlaps between same-frequency
    different-length clips.

    Scale shape: decode + framing is the one Arrow-batched
    mapInPandas pass (m07 posture — payloads never shuffle); the
    shingle stage is a per-doc frame-window projection (frame counts
    are tiny); the ONLY corpus join keys on the md5 shingle over
    near-singleton buckets (the l02/m10 invariant); sizes re-agg
    the fingerprint table; jaccard is one IEEE division over exact
    counts."""
    from hadoop_release_spark.operators.multimodal import (
        attach_audio_payload,
        audio_zero_crossings,
    )

    d = attach_audio_payload(table(spark, sf_dir, "documents").select("doc_id"))
    frames = audio_zero_crossings(d).select(
        "doc_id", "frame_idx", F.col("zero_crossings").alias("zc")
    )
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    sh = (
        frames.withColumn("zc1", F.lead("zc", 1).over(w))
        .withColumn("zc2", F.lead("zc", 2).over(w))
        .filter(F.col("zc2").isNotNull())
        .select(
            "doc_id",
            F.md5(F.concat_ws(",", "zc", "zc1", "zc2")).alias("key"),
        )
    )
    fps = sh.distinct()
    # fps feeds both pair sides and the size table; persist so the
    # Python decode stage runs once (released by the wrapper).
    fps = fps.persist()
    sizes = fps.groupBy("doc_id").agg(F.count("*").cast("long").alias("ns"))
    a = fps.select(F.col("doc_id").alias("doc_a"), "key")
    b = fps.select(F.col("doc_id").alias("doc_b"), "key")
    shared = (
        a.join(b, "key")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("long").alias("shared_shingles"))
    )
    za = sizes.select(F.col("doc_id").alias("doc_a"), F.col("ns").alias("n_a"))
    zb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("ns").alias("n_b"))
    return (
        shared.join(za, "doc_a")
        .join(zb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "shared_shingles",
            "n_a",
            "n_b",
            (
                F.col("shared_shingles").cast("double")
                / (
                    F.col("n_a") + F.col("n_b") - F.col("shared_shingles")
                ).cast("double")
            ).alias("jaccard"),
        )
    )


@register(
    "m12_image_dup_survivors",
    oracle=f"""
    WITH RECURSIVE {_o_m09_ctes()}, pairs AS (
      SELECT c.doc_a AS id_a, c.doc_b AS id_b
      FROM cand c
      JOIN hashes ha ON c.doc_a = ha.doc_id
      JOIN hashes hb ON c.doc_b = hb.doc_id
      WHERE bit_count(xor(ha.lo, hb.lo))
            + bit_count(xor(ha.hi, hb.hi)) = 0
    ), edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL
      SELECT id_b AS src, id_a AS dst FROM pairs
    ), reach AS (
      SELECT doc_id AS node, doc_id AS r FROM documents
      UNION
      SELECT e.dst AS node, reach.r FROM edges e
      JOIN reach ON reach.node = e.src
    )
    SELECT node AS doc_id, min(r) AS canonical_id,
           (node = min(r)) AS is_survivor
    FROM reach GROUP BY node
    """,
    priority="P2",
)
def m12_image_dup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end IMAGE deduplication — l22's pipeline completed for
    the image modality: m09's EXACT-hash pairs (Hamming 0 on the
    real-decode aHash — byte-stable copies, the content-ID rule) →
    connected components (copies chained through intermediates are
    ONE group) → survivor = min doc_id per component, every doc
    emitted with its canonical id and keep/drop flag. Built by
    CALLING m09 and the shared union-find (operators/dedup.py
    connected_components_min_label — the same component engine l22
    uses), with the oracle reusing m09's CTE chain verbatim
    (_o_m09_ctes) + the l22 recursive-closure suffix: neither the
    hash arithmetic nor the component rule can diverge from the ops
    they came from.

    Radius 0, deliberately — NOT m09's analysis radius 6: Hamming
    is not transitive, so TRANSITIVE grouping at radius > 0 chains
    unrelated images through borderline links. Measured on the
    gen_sf sf1 corpus (50k tiny fixture images): radius-6 grouping
    yields a 140k-edge collision graph whose giant component chains
    thousands of unrelated docs and needs unbounded label rounds.
    The radius-6 PAIR table is m09's analysis product; GROUPS are
    only sound where the relation is a true equivalence — exact
    hash equality.

    And because the relation IS exact hash equality, the components
    are computable with NO pair table and NO closure at all
    (round-11 — the m13/m14 set-digest argument at radius 0): two
    docs are linked iff their (lo, hi) aHashes are equal, equal-hash
    pairs always share all four LSH bands so m09's candidate gate
    never excludes one, and the connected components of an
    equal-value relation are simply the value groups. A window-min
    over the hash yields the identical partition the pair+union-find
    plan computed, pinned old-vs-new by
    tests/test_multimodal.py::test_m12_digest_plan_equals_pair_closure_plan.

    Scale shape: ONE Arrow decode pass (payloads never shuffle),
    then a single (lo, hi)-keyed window-min over one slim 3-long row
    per image — the band self-join, the Hamming verify join, and the
    iterative min-label rounds are all gone. The oracle keeps the
    original m09-CTE + recursive-closure construction, so DuckDB
    independently re-proves groups == closure components on every
    grade."""
    from hadoop_release_spark.operators.multimodal import (
        attach_image_payload_canon,
        image_ahash,
    )

    d = attach_image_payload_canon(
        table(spark, sf_dir, "documents").select("doc_id")
    )
    hashes = image_ahash(d).select("doc_id", "ahash_lo", "ahash_hi")
    canonical = F.min("doc_id").over(
        Window.partitionBy("ahash_lo", "ahash_hi")
    )
    return hashes.select(
        "doc_id",
        canonical.alias("canonical_id"),
        (F.col("doc_id") == canonical).alias("is_survivor"),
    )


@register(
    "m13_video_dup_survivors",
    oracle=f"""
    WITH {_o_m10_ctes()}, digs AS (
      SELECT doc_id,
             md5(string_agg(CAST(lo AS VARCHAR) || ','
                            || CAST(hi AS VARCHAR), ';'
                            ORDER BY lo, hi)) AS dig
      FROM fps GROUP BY doc_id
    ), canon AS (
      SELECT dig, min(doc_id) AS canonical_id FROM digs GROUP BY dig
    )
    SELECT d.doc_id,
           coalesce(c.canonical_id, d.doc_id) AS canonical_id,
           (d.doc_id = coalesce(c.canonical_id, d.doc_id))
             AS is_survivor
    FROM documents d
    LEFT JOIN digs g ON d.doc_id = g.doc_id
    LEFT JOIN canon c ON g.dig = c.dig
    """,
    priority="P2",
)
def m13_video_dup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end VIDEO deduplication: docs whose frame-fingerprint
    SETS are equal (Jaccard exactly 1 — re-encoded copies of the
    same clip) collapse to one group, min-id survivor, every doc
    emitted with its canonical id and keep/drop flag.

    Set equality is already an equivalence relation, so the groups
    ARE computable without materializing pairs: group docs directly
    by a DIGEST of the sorted distinct fingerprint set (round-9
    verdict item 2 — the previous plan generated m10's candidate
    pairs, filtered to shared = |A| = |B|, then ran the iterative
    union-find closure; the digest groupBy produces the identical
    partition in O(N) with no self-join and no label rounds; the
    equivalence is pinned by tests/test_multimodal.py's
    old-plan-vs-new-plan check). Docs with an EMPTY fingerprint set
    never reach the digest groupBy and stay singletons via the
    left join — the pair-based rule never linked them either (a
    naive digest over empties would have merged them).

    Scale shape: one Arrow-batched decode pass (payloads never
    shuffle — the m06/m09 invariant) that emits the per-clip set
    digest DIRECTLY (all of a clip's frames arrive on one input
    row, so the sorted-distinct fingerprint set never leaves
    Python — round-11 profile: the former doc-keyed frame-row
    exchange + collect_set was ~1 s of the 3.2 s wall), then one
    dig-keyed window-min for the survivor and one doc-keyed join
    back to the corpus spine. No candidate pairs, no iteration —
    strictly less work than m10 itself. m10's partial-overlap pairs
    (trimmed / extended clips) remain its ANALYSIS product and
    never enter grouping, same as before."""
    from hadoop_release_spark.operators.multimodal import (
        attach_video_payload_canon,
        video_frame_set_digests,
    )

    d = attach_video_payload_canon(
        table(spark, sf_dir, "documents").select("doc_id")
    )
    # the digest IS computed inside the decode pass — bit-compatible
    # with md5(concat_ws(";", sort_array(collect_set("lo,hi"))))
    digs = video_frame_set_digests(d)
    digs = digs.withColumn(
        "canonical_id", F.min("doc_id").over(Window.partitionBy("dig"))
    )
    docs = table(spark, sf_dir, "documents").select("doc_id")
    canonical = F.coalesce(F.col("canonical_id"), F.col("doc_id"))
    return docs.join(digs, "doc_id", "left").select(
        "doc_id",
        canonical.alias("canonical_id"),
        (F.col("doc_id") == canonical).alias("is_survivor"),
    )


@register(
    "m14_audio_dup_survivors",
    oracle=f"""
    WITH {_o_m11_ctes()}, digs AS (
      SELECT doc_id, md5(string_agg(key, ';' ORDER BY key)) AS dig
      FROM fps GROUP BY doc_id
    ), canon AS (
      SELECT dig, min(doc_id) AS canonical_id FROM digs GROUP BY dig
    )
    SELECT d.doc_id,
           coalesce(c.canonical_id, d.doc_id) AS canonical_id,
           (d.doc_id = coalesce(c.canonical_id, d.doc_id))
             AS is_survivor
    FROM documents d
    LEFT JOIN digs g ON d.doc_id = g.doc_id
    LEFT JOIN canon c ON g.dig = c.dig
    """,
    priority="P2",
)
def m14_audio_dup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end AUDIO deduplication — the m13 digest pattern for
    the audio modality: docs whose zero-crossing-shingle SETS are
    equal (byte-identical tones / re-encodes) group directly by a
    digest of the sorted shingle set, min-id survivor per group.
    The m07 fixture's tone classes make distinct docs carry
    IDENTICAL audio naturally, so the groups are real multi-doc
    classes (≈ |docs| / 128 members each), not just planted pairs.

    Set equality is already an equivalence, so no pair
    materialization and no union-find closure are needed (round-9
    verdict item 2 — the previous plan filtered m11's candidate
    pairs to shared = |A| = |B| and iterated connected components;
    the digest groupBy yields the identical partition in O(N),
    pinned old-vs-new by tests/test_multimodal.py). Empty-shingle
    docs stay singletons via the left join, exactly as the
    pair-based rule left them. m11's partial-overlap pairs (same
    frequency, different length) are its ANALYSIS product and never
    enter grouping.

    Scale shape: one Arrow-batched decode pass (payloads never
    shuffle) that emits the per-doc shingle-set digest DIRECTLY —
    a doc's frames all arrive on one input row, so the former
    doc-keyed lead() window + collect_set exchange is gone
    (round-11, the m13 treatment); what remains is a dig-keyed
    window-min and the doc-keyed spine join over one slim row per
    doc. No corpus self-join, no iteration."""
    from hadoop_release_spark.operators.multimodal import (
        attach_audio_payload,
        audio_shingle_set_digests,
    )

    d = attach_audio_payload(table(spark, sf_dir, "documents").select("doc_id"))
    # the digest IS computed inside the decode pass — bit-compatible
    # with the lead()-window + collect_set expression it replaces
    digs = audio_shingle_set_digests(d)
    digs = digs.withColumn(
        "canonical_id", F.min("doc_id").over(Window.partitionBy("dig"))
    )
    docs = table(spark, sf_dir, "documents").select("doc_id")
    canonical = F.coalesce(F.col("canonical_id"), F.col("doc_id"))
    return docs.join(digs, "doc_id", "left").select(
        "doc_id",
        canonical.alias("canonical_id"),
        (F.col("doc_id") == canonical).alias("is_survivor"),
    )
