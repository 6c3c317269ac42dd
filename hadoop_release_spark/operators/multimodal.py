"""Multimodal column operators: opaque binary payloads + typed metadata.

Design (SURVEY.md §2 addendum): image/audio/video payloads are
``binary`` columns carried alongside typed metadata columns; decode /
feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages so the heavy bytes stream through Python in
columnar batches without ever materializing on the driver.

The decoders are REAL for the uncompressed container formats —
24-bit BMP and 16-bit PCM RIFF/WAV — implemented against the public
format specs with nothing but ``struct``/``math`` (this container has
no Pillow/libav, which only rules out COMPRESSED codecs: JPEG/PNG/
MP3/AAC payloads raise ``NotImplementedError`` with a clear message
rather than pretending). The fixture payload builders emit genuine
BMP/WAV bytes, so the registered m02/m03 queries exercise the real
decode path end-to-end: encode → binary column → mapInPandas decode →
features.

Scale notes: binary payloads dominate row width, so (a) metadata-only
predicates must be applied BEFORE any mapInPandas stage (column
pruning keeps payload bytes out of scans that don't need them), and
(b) ``spark.sql.files.maxPartitionBytes`` should be sized so one
task's batch of payloads fits executor memory.
"""

from __future__ import annotations

import hashlib
import math
import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Output schema of the image feature extractor.
IMAGE_FEATURES_SCHEMA = (
    "doc_id long, n_bytes long, width int, height int, channels int, checksum long"
)

#: Output schema of the audio frame sampler.
AUDIO_FRAMES_SCHEMA = "doc_id long, frame_idx int, frame_checksum long"

#: Output schema of the image resizer.
IMAGE_RESIZE_SCHEMA = (
    "doc_id long, new_width int, new_height int, sum_r long, sum_g long, sum_b long"
)


# --------------------------------------------------------------------------
# Real codecs (public format specs, stdlib only)
# --------------------------------------------------------------------------


def encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    """Encode raw RGB bytes (row-major, top-down, 3 bytes/pixel) as a
    24-bit uncompressed BMP (BITMAPINFOHEADER). Rows are padded to
    4-byte boundaries and stored bottom-up per the spec."""
    if len(rgb) != width * height * 3:
        raise ValueError(f"need {width * height * 3} RGB bytes, got {len(rgb)}")
    row_size = (width * 3 + 3) & ~3
    # Vectorized byte shuffle (round-11: the per-pixel Python loop was
    # ~1 s of every m-family query's wall): flip to bottom-up row
    # order, swap RGB→BGR, right-pad each row to the 4-byte boundary.
    arr = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3)
    bgr = arr[::-1, :, ::-1]
    padded = np.zeros((height, row_size), dtype=np.uint8)
    padded[:, : width * 3] = bgr.reshape(height, width * 3)
    pixel_bytes = padded.tobytes()
    data_offset = 14 + 40
    file_size = data_offset + len(pixel_bytes)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, data_offset)
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixel_bytes), 2835, 2835, 0, 0)
    return header + dib + bytes(pixel_bytes)


def decode_bmp(payload: bytes) -> tuple[int, int, int, bytes]:
    """Decode a 24-bit uncompressed BMP → (width, height, channels,
    top-down RGB bytes). Compressed or non-24bpp BMPs and non-BMP
    magic raise with a clear message."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise NotImplementedError(
            "not an uncompressed BMP; compressed codecs (JPEG/PNG/…) need "
            "an image library not present in this container"
        )
    (_, _, _, _, data_offset) = struct.unpack("<2sIHHI", payload[:14])
    (hdr_size, width, height, _, bpp, compression) = struct.unpack(
        "<IiiHHI", payload[14:34]
    )
    if hdr_size < 40 or bpp != 24 or compression != 0:
        raise NotImplementedError(f"unsupported BMP variant (bpp={bpp}, compression={compression})")
    bottom_up = height > 0
    height = abs(height)
    row_size = (width * 3 + 3) & ~3
    if len(payload) < data_offset + row_size * height:
        # Self-describing failure for external callers (advisor,
        # round 12): np.frombuffer's own "buffer is smaller than
        # requested size" names neither the file format nor the
        # dimensions. (The round-10 per-row loop silently tolerated
        # truncation; all in-repo payloads are generated well-formed,
        # so raising is a tightening, not a behavior change in any
        # shipped plan.)
        raise ValueError(
            f"truncated BMP: header declares {width}x{height}x24bpp "
            f"pixel data ({row_size * height} bytes at offset "
            f"{data_offset}) but payload is {len(payload)} bytes"
        )
    # Vectorized inverse of encode_bmp (round-11): strip row padding,
    # swap BGR→RGB, un-flip bottom-up row order.
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=row_size * height, offset=data_offset
    ).reshape(height, row_size)
    px = rows[:, : width * 3].reshape(height, width, 3)
    if bottom_up:
        px = px[::-1]
    return width, height, 3, px[:, :, ::-1].tobytes()


def encode_wav_pcm16(samples: list[int], sample_rate: int = 8000) -> bytes:
    """Encode mono 16-bit PCM samples as a RIFF/WAVE file."""
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt + b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[int, list[int]]:
    """Decode a mono 16-bit PCM RIFF/WAVE file → (sample_rate,
    samples). Compressed audio raises with a clear message."""
    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError(
            "not a RIFF/WAVE file; compressed codecs (MP3/AAC/…) need an "
            "audio library not present in this container"
        )
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(payload):
        chunk_id = payload[pos : pos + 4]
        (chunk_len,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + chunk_len]
        if chunk_id == b"fmt ":
            audio_fmt, channels, rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise NotImplementedError(
                    f"unsupported WAV variant (fmt={audio_fmt}, ch={channels}, bits={bits})"
                )
        elif chunk_id == b"data":
            samples = list(struct.unpack(f"<{chunk_len // 2}h", body[: chunk_len & ~1]))
        pos += 8 + chunk_len + (chunk_len & 1)  # chunks are word-aligned
    if rate is None or samples is None:
        raise NotImplementedError("WAV missing fmt/data chunk")
    return rate, samples


# --------------------------------------------------------------------------
# Deterministic fixture payload builders (REAL encoded media)
# --------------------------------------------------------------------------


def _doc_bmp(doc_id: int, n_chars: int) -> bytes:
    """A genuine 24-bit BMP whose shape derives from doc metadata and
    whose pixels derive from md5(doc_id) — deterministic across runs
    and partitionings."""
    width = n_chars % 13 + 4
    height = n_chars % 7 + 4
    seed = hashlib.md5(str(doc_id).encode()).digest()
    n = width * height * 3
    rgb = (seed * (n // len(seed) + 1))[:n]
    return encode_bmp(width, height, rgb)


def _doc_wav(doc_id: int) -> bytes:
    """A genuine PCM16 WAV: one sine tone whose frequency and length
    derive from doc_id (lengths cycle 192/256/320/384 samples so the
    frame counts vary)."""
    freq = 200 + (doc_id % 32) * 25
    n = 192 + (doc_id % 4) * 64
    rate = 8000
    samples = [int(12000 * math.sin(2 * math.pi * freq * i / rate)) for i in range(n)]
    return encode_wav_pcm16(samples, rate)


def attach_image_payload(df: DataFrame) -> DataFrame:
    """Attach a binary column of real encoded BMP bytes (stand-in for
    a corpus's stored media; at scale this column comes off disk).
    (spread_small_scan deliberately NOT applied: the BMP synth is
    cheap per row — measured A/B r16, the added rebalance exchange
    cost more than the parallel kernel saved; contrast
    attach_audio_payload.)"""

    @F.pandas_udf("binary")
    def make(doc_id: pd.Series, n_chars: pd.Series) -> pd.Series:
        return pd.Series(
            [_doc_bmp(int(d), int(c)) for d, c in zip(doc_id, n_chars)]
        )

    return df.withColumn("payload", make("doc_id", "n_chars"))


def attach_audio_payload(df: DataFrame) -> DataFrame:
    """Attach a binary column of real PCM16 WAV bytes.
    spread_small_scan first: the per-sample sine synthesis is heavy
    Python and otherwise runs as ONE task over a single-file fixture
    scan (the d37 guard; m07 med 1.26 → 0.97 s, m14 1.79 → 1.35 s in
    the r16 interleaved A/B). Payload bytes derive from doc_id only,
    identical under any partitioning."""
    from hadoop_release_spark.functions.partitioning import (
        spread_small_scan,
    )

    @F.pandas_udf("binary")
    def make(doc_id: pd.Series) -> pd.Series:
        return pd.Series([_doc_wav(int(d)) for d in doc_id])

    return spread_small_scan(df).withColumn("payload", make("doc_id"))


def attach_fake_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Opaque binary column from UTF-8 text bytes — used where the
    payload's CONTENT is irrelevant (m01 metadata handling)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


# --------------------------------------------------------------------------
# mapInPandas feature extractors (real decode in the hot path)
# --------------------------------------------------------------------------


def extract_image_features(df: DataFrame) -> DataFrame:
    """mapInPandas image feature extraction: REAL BMP decode per
    payload → dimensions + pixel checksum."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                payload = bytes(payload)
                width, height, channels, rgb = decode_bmp(payload)
                rows.append(
                    (doc_id, len(payload), width, height, channels, zlib.crc32(rgb))
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_bytes", "width", "height", "channels", "checksum"],
            )

    return df.select("doc_id", "payload").mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)


def resize_image_features(df: DataFrame, factor: int = 2) -> DataFrame:
    """mapInPandas image resize: REAL BMP decode → nearest-neighbor
    downsample by ``factor`` (output pixel (x,y) samples source pixel
    (factor·x, factor·y)) → per-channel pixel sums of the resized
    image. The sums are exact integers, which is what makes the whole
    decode+resample path hash-checkable by a SQL oracle (means/floats
    would not be). numpy strided slicing does the sampling — no
    per-pixel Python loop."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                width, height, _, rgb = decode_bmp(bytes(payload))
                arr = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3)
                nw, nh = width // factor, height // factor
                resized = arr[0 : nh * factor : factor, 0 : nw * factor : factor]
                sums = resized.sum(axis=(0, 1), dtype=np.int64)
                rows.append(
                    (doc_id, nw, nh, int(sums[0]), int(sums[1]), int(sums[2]))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "new_width", "new_height", "sum_r", "sum_g", "sum_b",
                ],
            )

    return df.select("doc_id", "payload").mapInPandas(run, schema=IMAGE_RESIZE_SCHEMA)


def sample_audio_frames(df: DataFrame, frame_samples: int = 64, max_frames: int = 4) -> DataFrame:
    """mapInPandas frame sampler: REAL WAV decode, then fixed-size
    PCM frames; per-frame checksum over the decoded samples (the
    row-expansion pattern: 1 payload → N frames)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            doc_ids, idxs, sums = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                _, samples = decode_wav(bytes(payload))
                n_frames = min(max_frames, max(len(samples) // frame_samples, 1))
                for k in range(n_frames):
                    frame = samples[k * frame_samples : (k + 1) * frame_samples]
                    doc_ids.append(doc_id)
                    idxs.append(k)
                    sums.append(zlib.crc32(struct.pack(f"<{len(frame)}h", *frame)))
            yield pd.DataFrame(
                {"doc_id": doc_ids, "frame_idx": idxs, "frame_checksum": sums}
            )

    return df.select("doc_id", "payload").mapInPandas(run, schema=AUDIO_FRAMES_SCHEMA)


# --------------------------------------------------------------------------
# Video: uncompressed multi-frame container (real per-frame BMP codec)
# --------------------------------------------------------------------------

#: Output schema of the video frame sampler.
VIDEO_FRAMES_SCHEMA = (
    "doc_id long, frame_idx int, width int, height int, "
    "sum_r long, sum_g long, sum_b long"
)


def encode_video(frames: list[bytes]) -> bytes:
    """Encode BMP frames as a minimal uncompressed video container:
    ``SVID`` magic + frame count + length-prefixed frames (the raw
    concatenated-frames layout of y4m-style uncompressed video, with
    each frame a REAL 24-bit BMP so per-frame decode exercises the
    actual image codec)."""
    out = bytearray(b"SVID" + struct.pack("<I", len(frames)))
    for fr in frames:
        out += struct.pack("<I", len(fr)) + fr
    return bytes(out)


def decode_video(payload: bytes) -> list[bytes]:
    """Decode the SVID container → list of per-frame BMP bytes.
    Compressed video (H.264/VP9/…) raises with a clear message —
    this container has no libav."""
    if len(payload) < 8 or payload[:4] != b"SVID":
        raise NotImplementedError(
            "not an SVID uncompressed container; compressed video codecs "
            "(H.264/VP9/…) need a video library not present in this container"
        )
    (n_frames,) = struct.unpack("<I", payload[4:8])
    frames, pos = [], 8
    for _ in range(n_frames):
        (ln,) = struct.unpack("<I", payload[pos : pos + 4])
        frames.append(payload[pos + 4 : pos + 4 + ln])
        pos += 4 + ln
    return frames


def _doc_video(doc_id: int, n_chars: int) -> bytes:
    """A genuine SVID clip: 2-6 BMP frames whose shape derives from
    doc metadata and whose pixels derive from md5(doc_id:frame) —
    deterministic across runs and partitionings."""
    width = n_chars % 9 + 4
    height = n_chars % 5 + 4
    n_frames = doc_id % 5 + 2
    n = width * height * 3
    frames = []
    for f in range(n_frames):
        seed = hashlib.md5(f"{doc_id}:{f}".encode()).digest()
        rgb = (seed * (n // len(seed) + 1))[:n]
        frames.append(encode_bmp(width, height, rgb))
    return encode_video(frames)


def attach_video_payload(df: DataFrame) -> DataFrame:
    """Attach a binary column of real SVID clip bytes.
    spread_small_scan: multi-frame clip synthesis is heavy Python
    (see attach_audio_payload); identical bytes under any
    partitioning."""
    from hadoop_release_spark.functions.partitioning import (
        spread_small_scan,
    )

    @F.pandas_udf("binary")
    def make(doc_id: pd.Series, n_chars: pd.Series) -> pd.Series:
        return pd.Series(
            [_doc_video(int(d), int(c)) for d, c in zip(doc_id, n_chars)]
        )

    return spread_small_scan(df).withColumn(
        "payload", make("doc_id", "n_chars")
    )


def sample_video_frames(df: DataFrame, stride: int = 2) -> DataFrame:
    """mapInPandas video frame sampler: container parse → every
    ``stride``-th frame → REAL BMP decode → per-channel integer pixel
    sums (1 clip → N sampled-frame rows; exact integers keep the
    whole parse+decode path on the SQL-oracle hash contract)."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                frames = decode_video(bytes(payload))
                for idx in range(0, len(frames), stride):
                    width, height, _, rgb = decode_bmp(frames[idx])
                    arr = np.frombuffer(rgb, dtype=np.uint8).reshape(-1, 3)
                    sums = arr.sum(axis=0, dtype=np.int64)
                    rows.append(
                        (doc_id, idx, width, height,
                         int(sums[0]), int(sums[1]), int(sums[2]))
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "frame_idx", "width", "height",
                    "sum_r", "sum_g", "sum_b",
                ],
            )

    return df.select("doc_id", "payload").mapInPandas(run, schema=VIDEO_FRAMES_SCHEMA)


AHASH_SCHEMA = (
    "doc_id long, width int, height int, ahash_lo long, ahash_hi long"
)


def image_ahash(df: DataFrame) -> DataFrame:
    """mapInPandas perceptual average-hash (aHash): REAL BMP decode →
    integer gray (r+g+b)//3 → 8×8 nearest-neighbor sample grid
    (cell (u,v) samples source pixel ((u·w)//8, (v·h)//8) — the m04
    floor rule) → mean threshold, ALL-INTEGER: bit idx (= v·8+u) is
    set iff 64·gray > Σgray, so no float mean can waver at the
    boundary. The 64 bits ship as two bigints (lo = bits 0–31,
    hi = 32–63) — Spark has no unsigned 64-bit integer."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, _, rgb = decode_bmp(bytes(payload))
                gray = (
                    np.frombuffer(rgb, dtype=np.uint8)
                    .astype(np.int64)
                    .reshape(h, w, 3)
                    .sum(axis=2)
                    // 3
                )
                xs = (np.arange(8) * w) // 8
                ys = (np.arange(8) * h) // 8
                g = gray[np.ix_(ys, xs)].ravel()  # idx = v*8 + u
                s = int(g.sum())
                b = (64 * g > s).astype(np.int64)
                pw = np.int64(1) << np.arange(32, dtype=np.int64)
                lo = int(b[:32] @ pw)
                hi = int(b[32:] @ pw)
                rows.append((doc_id, w, h, lo, hi))
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "ahash_lo", "ahash_hi"]
            )

    return df.select("doc_id", "payload").mapInPandas(run, schema=AHASH_SCHEMA)


def audio_zero_crossings(df: DataFrame, frame_samples: int = 64) -> DataFrame:
    """mapInPandas audio fingerprinting: REAL WAV decode → per-frame
    zero-crossing counts (the classic O(1)-state pitch/voicing
    feature; a frame's count ≈ 2·freq·frame_len/rate). A strict sign
    flip (+→− or −→+) between ADJACENT samples counts; zero samples
    break adjacency (no crossing through silence) — the convention
    the analytic oracle mirrors exactly. numpy does the sign/compare
    work vectorized; only whole frames are emitted."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            doc_ids, idxs, zc = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                _, samples = decode_wav(bytes(payload))
                arr = np.sign(np.asarray(samples, dtype=np.int64))
                for k in range(len(samples) // frame_samples):
                    fr = arr[k * frame_samples : (k + 1) * frame_samples]
                    doc_ids.append(doc_id)
                    idxs.append(k)
                    zc.append(int(np.sum(fr[1:] * fr[:-1] == -1)))
            yield pd.DataFrame(
                {"doc_id": doc_ids, "frame_idx": idxs, "zero_crossings": zc}
            )

    return df.select("doc_id", "payload").mapInPandas(
        run, schema="doc_id long, frame_idx int, zero_crossings long"
    )


def audio_shingle_set_digests(
    df: DataFrame, frame_samples: int = 64
) -> DataFrame:
    """One (doc_id, dig) row per WAV: md5 digest of the SORTED
    DISTINCT 3-frame zero-crossing shingle set, computed INSIDE the
    decode pass — the audio twin of ``video_frame_set_digests``.
    All of a doc's frames come from one input row, so neither frame
    rows nor shingle rows ever shuffle; this replaces
    ``audio_zero_crossings`` + a doc-keyed lead() window + a
    collect_set digest agg with zero exchanges before the dig
    grouping. Bit-compatible with the expression plan it replaces:
    shingle key = md5("zc,zc1,zc2"), digest = md5 of ";".join of
    lexicographically sorted distinct keys. Docs with fewer than 3
    whole frames emit NO row (the lead(…,2) filter left them out of
    the old aggregation too — they must stay singletons)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                _, samples = decode_wav(bytes(payload))
                arr = np.sign(np.asarray(samples, dtype=np.int64))
                zc = [
                    int(
                        np.sum(
                            arr[k * frame_samples + 1 : (k + 1) * frame_samples]
                            * arr[k * frame_samples : (k + 1) * frame_samples - 1]
                            == -1
                        )
                    )
                    for k in range(len(samples) // frame_samples)
                ]
                keys = {
                    hashlib.md5(
                        f"{zc[i]},{zc[i + 1]},{zc[i + 2]}".encode()
                    ).hexdigest()
                    for i in range(len(zc) - 2)
                }
                if keys:
                    rows.append(
                        (
                            doc_id,
                            hashlib.md5(
                                ";".join(sorted(keys)).encode()
                            ).hexdigest(),
                        )
                    )
            yield pd.DataFrame(rows, columns=["doc_id", "dig"])

    return df.select("doc_id", "payload").mapInPandas(
        run, schema="doc_id long, dig string"
    )


def video_scene_cuts(df: DataFrame) -> DataFrame:
    """mapInPandas scene-cut detection: container parse → REAL BMP
    decode of every frame → total absolute pixel difference between
    consecutive frames (exact integers — what keeps the whole
    parse+decode+diff path on the SQL-oracle hash contract). A pair
    whose mean byte difference exceeds 256/3 (the uniform-random
    expectation ≈85.3) flags as a cut; the integer form
    ``diff*3 > 256*n`` avoids any float threshold."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                frames = decode_video(bytes(payload))
                prev = None
                for idx, frame in enumerate(frames):
                    _, _, _, rgb = decode_bmp(frame)
                    arr = np.frombuffer(rgb, dtype=np.uint8).astype(np.int64)
                    if prev is not None:
                        diff = int(np.abs(arr - prev).sum())
                        rows.append(
                            (doc_id, idx, diff, diff * 3 > 256 * arr.size)
                        )
                    prev = arr
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "frame_idx", "diff_total", "is_cut"],
            )

    return df.select("doc_id", "payload").mapInPandas(
        run, schema="doc_id long, frame_idx int, diff_total long, is_cut boolean"
    )


def attach_image_payload_canon(df: DataFrame) -> DataFrame:
    """Image payload variant with PLANTED near-duplicates: every doc
    whose id ends in 9 carries its predecessor's exact image (canon
    id = doc_id − 1), and dims derive from the canon id too, so the
    pair's BMPs are byte-identical — the ~10% duplicate rate an
    image-dedup operator must surface. Deterministic and
    oracle-replayable (hex = md5(canon), w = canon % 13 + 4,
    h = canon % 7 + 4)."""

    @F.pandas_udf("binary")
    def make(doc_id: pd.Series) -> pd.Series:
        out = []
        for d in doc_id:
            d = int(d)
            canon = d - 1 if d % 10 == 9 else d
            out.append(_doc_bmp(canon, canon))
        return pd.Series(out)

    return df.withColumn("payload", make("doc_id"))


def attach_video_payload_canon(df: DataFrame) -> DataFrame:
    """Video payload variant with PLANTED duplicate clips (the m09
    canon-id rule): a doc whose id ends in 9 carries its
    predecessor's exact clip, dims and frame pixels keyed on the
    canon id — deterministic and oracle-replayable.
    spread_small_scan: see attach_video_payload."""
    from hadoop_release_spark.functions.partitioning import (
        spread_small_scan,
    )

    df = spread_small_scan(df)

    @F.pandas_udf("binary")
    def make(doc_id: pd.Series) -> pd.Series:
        out = []
        for d in doc_id:
            d = int(d)
            canon = d - 1 if d % 10 == 9 else d
            out.append(_doc_video(canon, canon))
        return pd.Series(out)

    return df.withColumn("payload", make("doc_id"))


FRAME_AHASH_SCHEMA = "doc_id long, frame_idx int, ahash_lo long, ahash_hi long"


def video_frame_ahashes(df: DataFrame, stride: int = 2) -> DataFrame:
    """mapInPandas per-frame perceptual hashing: container parse →
    every ``stride``-th frame → REAL BMP decode → the m06 aHash
    (integer gray, 8×8 floor-rule grid, 64·gray > Σgray threshold).
    1 clip → N sampled-frame rows of four integers — the video
    fingerprint set a near-dup join consumes."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                frames = decode_video(bytes(payload))
                for idx in range(0, len(frames), stride):
                    w, h, _, rgb = decode_bmp(frames[idx])
                    gray = (
                        np.frombuffer(rgb, dtype=np.uint8)
                        .astype(np.int64)
                        .reshape(h, w, 3)
                        .sum(axis=2)
                        // 3
                    )
                    xs = (np.arange(8) * w) // 8
                    ys = (np.arange(8) * h) // 8
                    g = gray[np.ix_(ys, xs)].ravel()
                    s = int(g.sum())
                    b = (64 * g > s).astype(np.int64)
                    pw = np.int64(1) << np.arange(32, dtype=np.int64)
                    lo = int(b[:32] @ pw)
                    hi = int(b[32:] @ pw)
                    rows.append((doc_id, idx, lo, hi))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "ahash_lo", "ahash_hi"]
            )

    return df.select("doc_id", "payload").mapInPandas(
        run, schema=FRAME_AHASH_SCHEMA
    )


def video_frame_set_digests(df: DataFrame, stride: int = 2) -> DataFrame:
    """One (doc_id, dig) row per clip: the md5 digest of the SORTED
    DISTINCT frame-aHash set, computed INSIDE the decode pass. All
    of a clip's frames come from one input row, so the set never
    leaves Python — this replaces ``video_frame_ahashes`` + a
    doc-keyed collect_set exchange with ZERO frame-row shuffle (the
    m13 profile measured that exchange at ~1 s of its 3.2 s wall).
    The digest string is bit-compatible with the expression plan it
    replaces: md5 of ";".join(lexicographically sorted distinct
    "lo,hi" strings) — Python str sort == Spark sort_array on
    ASCII digit strings. Clips with an empty sampled-frame set emit
    NO row (they must stay singletons in m13's left join, exactly
    as the absent-from-aggregation behavior of the old plan)."""
    import hashlib

    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                frames = decode_video(bytes(payload))
                fps = set()
                for idx in range(0, len(frames), stride):
                    w, h, _, rgb = decode_bmp(frames[idx])
                    gray = (
                        np.frombuffer(rgb, dtype=np.uint8)
                        .astype(np.int64)
                        .reshape(h, w, 3)
                        .sum(axis=2)
                        // 3
                    )
                    xs = (np.arange(8) * w) // 8
                    ys = (np.arange(8) * h) // 8
                    g = gray[np.ix_(ys, xs)].ravel()
                    s = int(g.sum())
                    b = (64 * g > s).astype(np.int64)
                    pw = np.int64(1) << np.arange(32, dtype=np.int64)
                    lo = int(b[:32] @ pw)
                    hi = int(b[32:] @ pw)
                    fps.add(f"{lo},{hi}")
                if fps:
                    dig = hashlib.md5(
                        ";".join(sorted(fps)).encode()
                    ).hexdigest()
                    rows.append((doc_id, dig))
            yield pd.DataFrame(rows, columns=["doc_id", "dig"])

    return df.select("doc_id", "payload").mapInPandas(
        run, schema="doc_id long, dig string"
    )
