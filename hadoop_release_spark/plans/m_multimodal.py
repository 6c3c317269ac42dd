"""§2.M (addendum) — multimodal binary-column pipeline.

Binary payloads + mapInPandas decode stages with REAL uncompressed
codecs (24-bit BMP, PCM16 WAV — public specs, stdlib only; see
operators/multimodal.py; compressed formats raise clearly, the
container has no image/audio libraries). m01's byte-length feature
is SQL-checkable; m02/m03 carry Python-side decoded-content
checksums (zlib.crc32 has no DuckDB equivalent) and are rows-only
with codec round-trip + determinism pytest coverage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_release_spark.catalog import table
from hadoop_release_spark.operators.multimodal import (
    attach_audio_payload,
    attach_fake_payload,
    attach_image_payload,
    extract_image_features,
    sample_audio_frames,
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


@register("m02_image_features", oracle=None, priority="P2")
def m02_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image decode + feature extraction via Arrow-batched
    mapInPandas: payloads are genuine 24-bit BMPs and the extractor
    runs a REAL stdlib BMP decoder (width/height/channels/pixel
    checksum). Rows-only: crc32 checksums have no SQL oracle;
    round-trip exactness is pinned in tests/test_multimodal.py."""
    d = attach_image_payload(table(spark, sf_dir, "documents"))
    return extract_image_features(d)


@register("m03_audio_frames", oracle=None, priority="P2")
def m03_audio_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio frame sampling: REAL PCM16 WAV decode, then 1 payload →
    N fixed-size sample frames through mapInPandas. Demonstrates the
    row-expanding batch shape (output rows ≠ input rows within one
    Arrow batch)."""
    d = attach_audio_payload(table(spark, sf_dir, "documents"))
    return sample_audio_frames(d)
