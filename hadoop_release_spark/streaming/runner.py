"""Structured Streaming bridge: bounded streams with deterministic
final results.

The reference's streaming model is directory-polling micro-batch by
convention (core Hadoop is batch-only); Structured Streaming is the
engine's native generalization. For the oracle-checkable contract we
run each streaming query over the fixture parquet with
``trigger(availableNow=True)`` into an in-memory sink: all input is
consumed in bounded micro-batches and the final materialized table
equals the batch semantics.

Output-mode discipline (verified semantics, not style):
  * aggregations → COMPLETE (append would withhold windows newer
    than the final watermark — the watermark only advances on the
    NEXT batch, which never comes at end-of-stream);
  * watermarked aggregations checked against a batch oracle → UPDATE
    with the input pinned to ONE micro-batch (update re-emits a
    changed window per batch, and the memory sink appends, so
    multiple batches would duplicate rows);
  * stateless transforms (dedup, stream-static joins) → APPEND.
Multi-batch behavioral semantics (late-data drops, append-mode
window emission) are pytest-verified in tests/test_streaming.py,
not hash-checked.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_release_spark.session import ensure_configs


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events as a stream, with the same ns→µs ts normalization the
    batch catalog applies. maxFilesPerTrigger=1 pins the fixture (one
    parquet file) to exactly one micro-batch — see module docstring."""
    ensure_configs(spark)
    # readStream requires a directory source; pathGlobFilter scopes it
    # to the events file within the fixture dir.
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .option("maxFilesPerTrigger", 1000)
        .parquet(sf_dir)
    )
    return raw.withColumn("ts_ns", F.col("ts")).withColumn(
        "ts", F.expr("timestamp_micros(ts div 1000)")
    )


def materialize(stream_df: DataFrame, output_mode: str = "append") -> DataFrame:
    """Run the stream to completion (availableNow) into a memory sink
    and return the final table."""
    name = "stream_out_" + uuid.uuid4().hex[:12]
    query = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return stream_df.sparkSession.table(name)
