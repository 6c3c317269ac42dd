"""Format round-trips: write a DataFrame out in a Hadoop-ecosystem
format and read it back with an explicit schema.

The reference's surface here is Hadoop Input/OutputFormats
(TextInputFormat, SequenceFile, and the columnar formats used via
libraries). In this engine each is a DataFrameReader/Writer pair;
paths are plain strings so the same code targets ``file:/`` locally
and ``hdfs:/``/object storage in production.

Round-trip scratch space lives under ``$SPARK_GRAFT_TMP`` (default
``/tmp/hadoop_release_spark``); each call writes a fresh directory so
re-runs never read stale output.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame


def scratch_dir(label: str) -> str:
    base = os.environ.get("SPARK_GRAFT_TMP", "/tmp/hadoop_release_spark")
    os.makedirs(base, exist_ok=True)
    return tempfile.mkdtemp(prefix=f"{label}-", dir=base)


def fixed_scratch_dir(label: str, key: str = "") -> str:
    """A STABLE per-(label, key) scratch path — for call sites whose
    write uses ``mode("overwrite")`` anyway (static partition
    overwrite truncates the whole path first, so staleness cannot
    leak). Repeated grading/bench invocations reuse one directory
    instead of accumulating an unbounded pile of mkdtemp copies
    (advisor find, c26's full partitioned events copy). NOT for
    consumers that need a fresh EMPTY dir (streaming checkpoints,
    append-shaped fragment writers) — those keep :func:`scratch_dir`.
    ``key`` distinguishes variants (e.g. the source sf_dir) so two
    fixture scales never overwrite each other mid-comparison."""
    import hashlib

    base = os.environ.get("SPARK_GRAFT_TMP", "/tmp/hadoop_release_spark")
    suffix = hashlib.md5(key.encode()).hexdigest()[:8] if key else "fixed"
    path = os.path.join(base, f"{label}-{suffix}")
    os.makedirs(path, exist_ok=True)
    return path


def roundtrip_csv(df: DataFrame, label: str) -> DataFrame:
    """Write as CSV with header, re-read with the ORIGINAL schema (no
    inference — inference is both slow at scale and lossy)."""
    path = scratch_dir(label)
    df.write.mode("overwrite").option("header", True).csv(path)
    return df.sparkSession.read.schema(df.schema).option("header", True).csv(path)


def roundtrip_json(df: DataFrame, label: str) -> DataFrame:
    """Write as JSON-lines, re-read with the original schema."""
    path = scratch_dir(label)
    df.write.mode("overwrite").json(path)
    return df.sparkSession.read.schema(df.schema).json(path)


def roundtrip_orc(df: DataFrame, label: str) -> DataFrame:
    """Write as ORC (the Hive-ecosystem columnar format), re-read."""
    path = scratch_dir(label)
    df.write.mode("overwrite").orc(path)
    return df.sparkSession.read.orc(path)


def roundtrip_text(df_one_string_col: DataFrame, label: str) -> DataFrame:
    """Write a single string column as raw text lines (the
    TextInputFormat analog), re-read as ``value: string``."""
    path = scratch_dir(label)
    df_one_string_col.write.mode("overwrite").text(path)
    return df_one_string_col.sparkSession.read.text(path)


def roundtrip_avro(df: DataFrame, label: str) -> DataFrame:
    """Write as Avro (the Hadoop row-oriented container format),
    re-read with the original schema. Requires the external
    spark-avro DataSource jar — callers must gate on
    ``plans.a_scans.spark_avro_available()``; the registration of
    a15_scan_avro_roundtrip is conditional on that probe."""
    path = scratch_dir(label)
    df.write.mode("overwrite").format("avro").save(path)
    return df.sparkSession.read.schema(df.schema).format("avro").load(path)
