"""Multimodal pipeline: real BMP/WAV codec round-trips, binary
schema, batch iteration, determinism, and row-expansion shape of the
mapInPandas stages."""

from __future__ import annotations

import math
import struct
import zlib

from pyspark.sql import functions as F

from hadoop_release_spark.operators.multimodal import (
    attach_audio_payload,
    attach_fake_payload,
    attach_image_payload,
    decode_bmp,
    decode_wav,
    encode_bmp,
    encode_wav_pcm16,
    extract_image_features,
    sample_audio_frames,
)


def _docs(spark):
    rows = [
        (i, f"document number {i} with some text payload " * (i % 3 + 1), 40 + i)
        for i in range(20)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, n_chars long")


# ------------------------------------------------------------------
# Codec unit tests (no Spark): the decoders are REAL — pin them
# against hand-built payloads per the public format specs.
# ------------------------------------------------------------------


def test_bmp_roundtrip_exact():
    # 3x2 image with distinct pixel values, width*3 not 4-aligned so
    # row padding is exercised.
    rgb = bytes(range(3 * 2 * 3))
    payload = encode_bmp(3, 2, rgb)
    assert payload[:2] == b"BM"
    w, h, c, back = decode_bmp(payload)
    assert (w, h, c) == (3, 2, 3)
    assert back == rgb  # bit-exact through BGR + bottom-up + padding


def test_bmp_rejects_non_bmp():
    import pytest

    with pytest.raises(NotImplementedError):
        decode_bmp(b"\x89PNG\r\n" + b"\x00" * 64)


def test_bmp_truncated_raises_named_error():
    """Round-12 advisor fix: a payload shorter than the header's
    declared pixel data must fail with a message naming the format
    and dimensions, not np.frombuffer's generic buffer error."""
    import pytest

    payload = encode_bmp(3, 2, bytes(range(3 * 2 * 3)))
    with pytest.raises(ValueError, match="truncated BMP.*3x2"):
        decode_bmp(payload[:-5])


def test_wav_roundtrip_exact():
    samples = [int(10000 * math.sin(i / 5)) for i in range(300)]
    payload = encode_wav_pcm16(samples, 8000)
    rate, back = decode_wav(payload)
    assert rate == 8000
    assert back == samples


def test_wav_rejects_non_wav():
    import pytest

    with pytest.raises(NotImplementedError):
        decode_wav(b"ID3" + b"\x00" * 64)


# ------------------------------------------------------------------
# Spark-side pipeline
# ------------------------------------------------------------------


def test_payload_is_binary(spark):
    d = attach_image_payload(_docs(spark))
    assert dict(d.dtypes)["payload"] == "binary"
    d2 = attach_fake_payload(_docs(spark))
    assert dict(d2.dtypes)["payload"] == "binary"


def test_image_features_schema_and_determinism(spark):
    d = attach_image_payload(_docs(spark))
    out1 = extract_image_features(d).orderBy("doc_id").collect()
    out2 = extract_image_features(d).orderBy("doc_id").collect()
    assert out1 == out2
    row = out1[0]
    # doc 0: n_chars=40 → width 40%13+4=5, height 40%7+4=9; a real
    # 24bpp BMP of that shape is 54 + 9*((5*3+3)&~3) bytes.
    assert (row.width, row.height, row.channels) == (5, 9, 3)
    assert row.n_bytes == 54 + 9 * ((5 * 3 + 3) & ~3)


def test_image_features_partition_invariance(spark):
    d = attach_image_payload(_docs(spark))
    one = sorted(extract_image_features(d.coalesce(1)).collect())
    many = sorted(extract_image_features(d.repartition(7)).collect())
    assert one == many


def test_audio_frames_expand_rows_and_match_python_decode(spark):
    d = attach_audio_payload(_docs(spark))
    frames = sample_audio_frames(d, frame_samples=64, max_frames=3)
    pdf = frames.toPandas()
    assert len(pdf) > 20  # row expansion happened
    assert set(pdf.columns) == {"doc_id", "frame_idx", "frame_checksum"}
    per_doc = pdf.groupby("doc_id").frame_idx.max()
    assert per_doc.max() == 2  # capped at max_frames

    # Recompute a frame checksum from a pure-Python decode of the
    # same deterministic payload: doc 1 → 225 Hz tone, 256 samples.
    from hadoop_release_spark.operators.multimodal import _doc_wav

    _, samples = decode_wav(_doc_wav(1))
    expected = zlib.crc32(struct.pack("<64h", *samples[:64]))
    got = pdf[(pdf.doc_id == 1) & (pdf.frame_idx == 0)].frame_checksum.iloc[0]
    assert got == expected


def test_metadata_predicate_prunes_payload(spark, sf_dir):
    # A metadata-only query over the multimodal table must not read
    # the payload column (column pruning through the projection).
    from hadoop_release_spark.catalog import table

    d = attach_fake_payload(table(spark, sf_dir, "documents"))
    meta_only = d.filter(F.col("lang") == "en").select("doc_id", "lang")
    plan = meta_only._jdf.queryExecution().executedPlan().toString()
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema and "text" not in read_schema[0], plan


# ------------------------------------------------------------------
# m04 resize: geometry + sampling arithmetic pinned by hand
# ------------------------------------------------------------------


def test_resize_sums_match_hand_computation(spark):
    """Nearest-neighbor 2x downsample must sample exactly pixels
    (2x, 2y) of the decoded top-down RGB image; pin the per-channel
    sums on a hand-built 5x4 BMP with distinct byte values."""
    from hadoop_release_spark.operators.multimodal import resize_image_features

    w, h = 5, 4
    rgb = bytes((i * 7) % 256 for i in range(w * h * 3))
    payload = encode_bmp(w, h, rgb)
    df = spark.createDataFrame([(1, payload)], "doc_id long, payload binary")
    [row] = resize_image_features(df).collect()
    assert (row["new_width"], row["new_height"]) == (2, 2)
    exp = [0, 0, 0]
    for y in (0, 2):
        for x in (0, 2):
            p = (y * w + x) * 3
            for ch in range(3):
                exp[ch] += rgb[p + ch]
    assert (row["sum_r"], row["sum_g"], row["sum_b"]) == tuple(exp)


def test_resize_deterministic_across_runs(spark):
    """Same fixture docs → identical resize rows on repeated runs
    (the payload builder and resampler are both deterministic)."""
    from hadoop_release_spark.operators.multimodal import resize_image_features

    d = attach_image_payload(_docs(spark))
    a = sorted(map(tuple, resize_image_features(d).collect()))
    b = sorted(map(tuple, resize_image_features(d).collect()))
    assert a == b and len(a) == 20


# ------------------------------------------------------------------
# m06 aHash: planted duplicates + hand-pinned threshold arithmetic
# ------------------------------------------------------------------


def test_ahash_identical_payloads_collide(spark):
    """The near-dedup contract: byte-identical images → identical
    64-bit aHash regardless of doc_id; a small pixel perturbation →
    a small Hamming distance (≠ hash equality), a wholesale pixel
    inversion → a large one."""
    from hadoop_release_spark.operators.multimodal import image_ahash

    w, h = 9, 6
    rgb = bytes((i * 31) % 256 for i in range(w * h * 3))
    near = bytearray(rgb)
    near[0] = (near[0] + 40) % 256  # nudge one pixel channel
    far = bytes(255 - b for b in rgb)
    df = spark.createDataFrame(
        [
            (1, encode_bmp(w, h, rgb)),
            (2, encode_bmp(w, h, rgb)),
            (3, encode_bmp(w, h, bytes(near))),
            (4, encode_bmp(w, h, far)),
        ],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: (r["ahash_lo"], r["ahash_hi"]) for r in image_ahash(df).collect()}
    assert rows[1] == rows[2]

    def hamming(a, b):
        return bin((a[0] ^ b[0]) | ((a[1] ^ b[1]) << 32)).count("1")

    assert hamming(rows[1], rows[3]) <= 4
    assert hamming(rows[1], rows[4]) >= 32


def test_ahash_threshold_arithmetic_by_hand(spark):
    """Pin the integer threshold rule (bit ⇔ 64·gray > Σgray) on an
    8×8 image whose gray values are known exactly: left half dark
    (gray 10), right half bright (gray 200) → bits set exactly on
    the bright columns."""
    from hadoop_release_spark.operators.multimodal import image_ahash

    w = h = 8
    rgb = bytearray()
    for y in range(h):
        for x in range(w):
            v = 10 if x < 4 else 200
            rgb += bytes((v, v, v))
    df = spark.createDataFrame(
        [(7, encode_bmp(w, h, bytes(rgb)))], "doc_id long, payload binary"
    )
    [row] = image_ahash(df).collect()
    assert (row["width"], row["height"]) == (8, 8)
    # bright cells are u in 4..7 of every row v: idx = v*8+u
    expect = [1 if (i % 8) >= 4 else 0 for i in range(64)]
    lo = sum(b << i for i, b in enumerate(expect[:32]))
    hi = sum(b << i for i, b in enumerate(expect[32:]))
    assert (row["ahash_lo"], row["ahash_hi"]) == (lo, hi)


def test_m09_planted_duplicate_pair(spark, tmp_path_factory):
    """The canon-id payload rule makes doc 9 carry doc 8's exact
    image: all four bands collide and the pair verifies at Hamming 0
    / is_near 1 through the REAL decode + banding path."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hadoop_release_spark.plans.m_multimodal import m09_phash_near_dup

    tmp = tmp_path_factory.mktemp("m09plant")
    tbl = pa.table(
        {
            "doc_id": pa.array([8, 9, 100], pa.int64()),
            "text": pa.array(["x", "y", "z"]),
            "lang": pa.array(["en"] * 3),
            "source": pa.array(["t"] * 3),
            "n_chars": pa.array([1, 1, 1], pa.int64()),
        }
    )
    pq.write_table(tbl, f"{tmp}/documents.parquet")
    rows = {
        (r.doc_a, r.doc_b): r
        for r in m09_phash_near_dup(spark, str(tmp)).collect()
    }
    assert (8, 9) in rows
    assert rows[(8, 9)].hamming == 0
    assert rows[(8, 9)].is_near == 1


def test_m10_planted_duplicate_clip(spark, tmp_path_factory):
    """The canon-id clip rule makes doc 9 carry doc 8's exact video:
    every sampled frame hash matches, so the pair surfaces with
    Jaccard 1.0 through the real container-parse + decode + aHash
    path."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hadoop_release_spark.plans.m_multimodal import m10_video_near_dup

    tmp = tmp_path_factory.mktemp("m10plant")
    tbl = pa.table(
        {
            "doc_id": pa.array([8, 9, 100], pa.int64()),
            "text": pa.array(["x", "y", "z"]),
            "lang": pa.array(["en"] * 3),
            "source": pa.array(["t"] * 3),
            "n_chars": pa.array([1, 1, 1], pa.int64()),
        }
    )
    pq.write_table(tbl, f"{tmp}/documents.parquet")
    rows = {
        (r.doc_a, r.doc_b): r
        for r in m10_video_near_dup(spark, str(tmp)).collect()
    }
    assert (8, 9) in rows
    r = rows[(8, 9)]
    assert r.jaccard == 1.0 and r.n_a == r.n_b == r.shared_frames


def test_m11_identical_tone_classes_score_one(spark, tmp_path_factory):
    """m07's tone construction makes docs 1 and 129 (same id mod 32
    AND mod 4) byte-identical audio: every shingle matches, Jaccard
    1.0 — while doc 50 (different frequency class) never pairs with
    them at full overlap."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hadoop_release_spark.plans.m_multimodal import m11_audio_near_dup

    tmp = tmp_path_factory.mktemp("m11plant")
    ids = [1, 129, 50]
    tbl = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(["x"] * 3),
            "lang": pa.array(["en"] * 3),
            "source": pa.array(["t"] * 3),
            "n_chars": pa.array([1] * 3, pa.int64()),
        }
    )
    pq.write_table(tbl, f"{tmp}/documents.parquet")
    rows = {
        (r.doc_a, r.doc_b): r
        for r in m11_audio_near_dup(spark, str(tmp)).collect()
    }
    assert (1, 129) in rows
    r = rows[(1, 129)]
    assert r.jaccard == 1.0 and r.n_a == r.n_b == r.shared_shingles
    assert all(
        v.jaccard < 1.0 for k, v in rows.items() if k != (1, 129)
    )


def test_m12_planted_duplicates_group_and_survive(spark, sf_dir):
    """m12: the fixture plants byte-identical images on docs with
    id % 10 == 9 (each carries its predecessor's image), so every
    such doc MUST be non-surviving with a canonical id at or below
    its predecessor (Hamming 0 ⇒ all bands collide ⇒ same
    component); docs in no near-pair must survive as their own
    canonical."""
    from hadoop_release_spark.plans.m_multimodal import (
        m12_image_dup_survivors,
    )

    rows = {r.doc_id: r for r in m12_image_dup_survivors(spark, sf_dir).collect()}
    assert rows, "m12 returned no rows"
    planted = [d for d in rows if d % 10 == 9 and d - 1 in rows]
    assert planted, "fixture has no planted duplicate pairs"
    for d in planted:
        assert rows[d].canonical_id <= d - 1, (d, rows[d])
        assert not rows[d].is_survivor
    # every component's canonical is its own minimum: the canonical
    # doc itself must be a survivor
    for d, r in rows.items():
        assert rows[r.canonical_id].is_survivor
        assert r.canonical_id <= d


def test_m13_video_survivors_group_planted_clips(spark, sf_dir):
    """m13: a doc with doc_id % 10 == 9 carries its predecessor's
    CLIP (the m10 canon rule) — identical frame-fingerprint sets, so
    both must land in one component with the lower id canonical;
    every component's canonical is its own surviving minimum."""
    from hadoop_release_spark.plans.m_multimodal import (
        m13_video_dup_survivors,
    )

    rows = {
        r.doc_id: r for r in m13_video_dup_survivors(spark, sf_dir).collect()
    }
    assert rows, "m13 returned no rows"
    planted = [d for d in rows if d % 10 == 9 and d - 1 in rows]
    assert planted, "fixture has no planted duplicate clips"
    for d in planted:
        assert rows[d].canonical_id <= d - 1, (d, rows[d])
        assert not rows[d].is_survivor
    for d, r in rows.items():
        assert rows[r.canonical_id].is_survivor
        assert r.canonical_id <= d


def test_m14_audio_survivors_group_tone_classes(spark, sf_dir):
    """m14: the m07/m11 fixture derives each doc's tone from
    (doc_id % 32 → frequency, doc_id % 4 → length), so every doc in
    one (freq, len) class carries IDENTICAL audio — identical
    zero-crossing shingle sets — and the whole class must share one
    component whose canonical is the class minimum."""
    from collections import defaultdict

    from hadoop_release_spark.plans.m_multimodal import (
        m14_audio_dup_survivors,
    )

    rows = {
        r.doc_id: r for r in m14_audio_dup_survivors(spark, sf_dir).collect()
    }
    assert rows, "m14 returned no rows"
    classes = defaultdict(list)
    for d in rows:
        classes[(d % 32, d % 4)].append(d)
    multi = [ds for ds in classes.values() if len(ds) >= 2]
    assert multi, "fixture has no multi-doc tone class"
    for ds in multi:
        comps = {rows[d].canonical_id for d in ds}
        assert len(comps) == 1, (ds, comps)
    for d, r in rows.items():
        assert rows[r.canonical_id].is_survivor
        assert r.canonical_id <= d


def _all_doc_ids(spark, sf_dir):
    """The FULL node set for the closure-equivalence pins, taken from
    the documents table itself — deriving it from the plan under
    test's own output keys (the round-11 form) would let a plan that
    silently DROPPED singleton docs still pass (advisor finding,
    round 12)."""
    from hadoop_release_spark.catalog import table

    return sorted(
        r.doc_id
        for r in table(spark, sf_dir, "documents").select("doc_id").collect()
    )


def _pairs_closure_survivors(docs, pairs):
    """The ROUND-9 m13/m14 construction, replayed in pure Python:
    set-equality pairs -> union-find -> min-id canonical. Kept as
    the reference the digest plan must reproduce exactly."""
    parent = {d: d for d in docs}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {d: find(d) for d in docs}


def test_m13_digest_plan_equals_pair_closure_plan(spark, sf_dir):
    """Round-10 rewrite pin: the set-digest groupBy must yield the
    IDENTICAL partition the previous plan computed via m10's
    equality pairs + connected components (set equality is an
    equivalence, so digest groups = closure components)."""
    from hadoop_release_spark.plans.m_multimodal import (
        m10_video_near_dup,
        m13_video_dup_survivors,
    )

    new = {
        r.doc_id: (r.canonical_id, r.is_survivor)
        for r in m13_video_dup_survivors(spark, sf_dir).collect()
    }
    eq_pairs = [
        (r.doc_a, r.doc_b)
        for r in m10_video_near_dup(spark, sf_dir).collect()
        if r.shared_frames == r.n_a and r.shared_frames == r.n_b
    ]
    canon = _pairs_closure_survivors(_all_doc_ids(spark, sf_dir), eq_pairs)
    want = {d: (c, d == c) for d, c in canon.items()}
    assert new == want, {
        k: (new.get(k), want.get(k)) for k in new if new[k] != want.get(k)
    }


def test_m14_digest_plan_equals_pair_closure_plan(spark, sf_dir):
    """Round-10 rewrite pin for the audio modality (see m13 twin)."""
    from hadoop_release_spark.plans.m_multimodal import (
        m11_audio_near_dup,
        m14_audio_dup_survivors,
    )

    new = {
        r.doc_id: (r.canonical_id, r.is_survivor)
        for r in m14_audio_dup_survivors(spark, sf_dir).collect()
    }
    eq_pairs = [
        (r.doc_a, r.doc_b)
        for r in m11_audio_near_dup(spark, sf_dir).collect()
        if r.shared_shingles == r.n_a and r.shared_shingles == r.n_b
    ]
    canon = _pairs_closure_survivors(_all_doc_ids(spark, sf_dir), eq_pairs)
    want = {d: (c, d == c) for d, c in canon.items()}
    assert new == want, {
        k: (new.get(k), want.get(k)) for k in new if new[k] != want.get(k)
    }


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_m13_m14_digest_in_decode_no_pre_digest_exchange(spark, sf_dir):
    """Round-11 shuffle-shape pin: the per-doc set digest is computed
    INSIDE the mapInPandas decode pass, so the only hash exchanges
    left in either plan are the dig-keyed survivor window and the
    doc-keyed spine join — the former frame/shingle-row exchange
    (collect_set / lead-window) must never reappear. With one slim
    (doc_id, dig) row per doc entering the plan, total hash
    exchanges are bounded at 3 (dig window + two join sides) and no
    aggregate over frame rows exists."""
    from hadoop_release_spark.plans.m_multimodal import (
        m13_video_dup_survivors,
        m14_audio_dup_survivors,
    )

    for fn in (m13_video_dup_survivors, m14_audio_dup_survivors):
        plan = _physical_plan(fn(spark, sf_dir))
        # the digest agg was an ObjectHashAggregate over collect_set;
        # in-UDF digests leave NO aggregate of any kind in the plan
        assert "HashAggregate" not in plan, plan
        assert "collect_set" not in plan, plan
        assert plan.count("Exchange hashpartitioning") <= 3, plan


def test_m12_digest_plan_equals_pair_closure_plan(spark, sf_dir):
    """Round-11 rewrite pin: grouping images directly by their exact
    aHash must yield the IDENTICAL partition the previous plan
    computed via m09's Hamming-0 pairs + connected components (equal
    hashes always share all four bands, so the candidate gate never
    drops an equal pair, and equality is a true equivalence)."""
    from hadoop_release_spark.plans.m_multimodal import (
        m09_phash_near_dup,
        m12_image_dup_survivors,
    )

    new = {
        r.doc_id: (r.canonical_id, r.is_survivor)
        for r in m12_image_dup_survivors(spark, sf_dir).collect()
    }
    eq_pairs = [
        (r.doc_a, r.doc_b)
        for r in m09_phash_near_dup(spark, sf_dir).collect()
        if r.hamming == 0
    ]
    canon = _pairs_closure_survivors(_all_doc_ids(spark, sf_dir), eq_pairs)
    want = {d: (c, d == c) for d, c in canon.items()}
    assert new == want, {
        k: (new.get(k), want.get(k)) for k in new if new[k] != want.get(k)
    }
