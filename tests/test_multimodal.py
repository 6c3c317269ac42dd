"""Multimodal plumbing: binary schema, batch iteration, determinism,
and row-expansion shape of the mapInPandas stages."""

from __future__ import annotations

import zlib

from pyspark.sql import functions as F

from hadoop_release_spark.operators.multimodal import (
    attach_fake_payload,
    extract_image_features,
    sample_audio_frames,
)


def _docs(spark):
    rows = [(i, f"document number {i} with some text payload " * (i % 3 + 1)) for i in range(20)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_payload_is_binary(spark):
    d = attach_fake_payload(_docs(spark))
    assert dict(d.dtypes)["payload"] == "binary"


def test_image_features_schema_and_determinism(spark):
    d = attach_fake_payload(_docs(spark))
    out1 = extract_image_features(d).orderBy("doc_id").collect()
    out2 = extract_image_features(d).orderBy("doc_id").collect()
    assert out1 == out2
    row = out1[0]
    assert row.n_bytes == len("document number 0 with some text payload ".encode())
    assert 16 <= row.width < 80 and 16 <= row.height < 80 and 1 <= row.channels <= 3
    assert row.checksum == zlib.crc32("document number 0 with some text payload ".encode())


def test_image_features_partition_invariance(spark):
    d = attach_fake_payload(_docs(spark))
    one = sorted(extract_image_features(d.coalesce(1)).collect())
    many = sorted(extract_image_features(d.repartition(7)).collect())
    assert one == many


def test_audio_frames_expand_rows(spark):
    d = attach_fake_payload(_docs(spark))
    frames = sample_audio_frames(d, frame_bytes=16, max_frames=3)
    pdf = frames.toPandas()
    assert len(pdf) > 20  # row expansion happened
    assert set(pdf.columns) == {"doc_id", "frame_idx", "frame_checksum"}
    per_doc = pdf.groupby("doc_id").frame_idx.max()
    assert per_doc.max() == 2  # capped at max_frames

    # Frame checksums recompute identically Python-side.
    payload = "document number 1 with some text payload ".encode() * 2
    expected = zlib.crc32(payload[:16])
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
