"""Multimodal column operators: opaque binary payloads + typed metadata.

Design (SURVEY.md §2 addendum): image/audio/video payloads are
``binary`` columns carried alongside typed metadata columns; decode /
feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages so the heavy bytes stream through Python in
columnar batches without ever materializing on the driver.

The image/audio codec libraries are not in this container, so the
actual decoders are STUBBED (clearly marked below) with a
deterministic fake that parses a fake 8-byte header. Everything
around the stub — binary schema, batch iteration, output schema,
partition behavior — is real and tested (tests/test_multimodal.py).

Scale notes: binary payloads dominate row width, so (a) metadata-only
predicates must be applied BEFORE any mapInPandas stage (column
pruning keeps payload bytes out of scans that don't need them), and
(b) ``spark.sql.files.maxPartitionBytes`` should be sized so one
task's batch of payloads fits executor memory.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Output schema of the image feature extractor.
IMAGE_FEATURES_SCHEMA = (
    "doc_id long, n_bytes long, width int, height int, channels int, checksum long"
)

#: Output schema of the audio frame sampler.
AUDIO_FRAMES_SCHEMA = "doc_id long, frame_idx int, frame_checksum long"


def _decode_image_stub(payload: bytes) -> tuple[int, int, int]:
    """STUB — deterministic fake image decode.

    A real implementation calls Pillow/libvips here (not present in
    this container). The fake parses width/height/channels from the
    first bytes so downstream plumbing sees realistic varied shapes.
    """
    if len(payload) < 3:
        raise ValueError("payload too short to be an encoded image")
    width = payload[0] % 64 + 16
    height = payload[1] % 64 + 16
    channels = payload[2] % 3 + 1
    return width, height, channels


def attach_fake_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize an opaque binary column (UTF-8 bytes of the text —
    a stand-in for real encoded media, with realistic variable size).
    """
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def extract_image_features(df: DataFrame) -> DataFrame:
    """mapInPandas image feature extraction over binary payloads."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [_decode_image_stub(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "channels": [d[2] for d in dims],
                    "checksum": [zlib.crc32(p) for p in pdf["payload"]],
                }
            )

    return df.select("doc_id", "payload").mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)


def sample_audio_frames(df: DataFrame, frame_bytes: int = 32, max_frames: int = 4) -> DataFrame:
    """mapInPandas frame sampler: split each payload into fixed-size
    frames, keep every k-th frame (decode stubbed as crc of the frame
    bytes — a real sampler would run the audio codec here)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            doc_ids, idxs, sums = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = min(max_frames, max(len(payload) // frame_bytes, 1))
                for k in range(n_frames):
                    frame = bytes(payload[k * frame_bytes : (k + 1) * frame_bytes])
                    doc_ids.append(doc_id)
                    idxs.append(k)
                    sums.append(zlib.crc32(frame))
            yield pd.DataFrame(
                {"doc_id": doc_ids, "frame_idx": idxs, "frame_checksum": sums}
            )

    return df.select("doc_id", "payload").mapInPandas(run, schema=AUDIO_FRAMES_SCHEMA)
