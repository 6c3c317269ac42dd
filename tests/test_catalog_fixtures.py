"""Regression tests for fixture-shape drift (the round-3 failure).

The driver regenerates /root/testdata between rounds and has shipped
``events.ts`` as both INT64 TIMESTAMP(NANOS) and plain timestamp[us].
``catalog.normalize_events`` must produce the identical (ts, ts_ns)
contract from either shape, so a regeneration can never again break
every events-reading query at plan-build time.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from hadoop_release_spark.catalog import normalize_events, table

# One µs-precision instant, expressed both ways.
_US = 1704067798778549  # 2024-01-01T00:09:58.778549Z
_ROWS_US = [
    datetime.datetime(2024, 1, 1, 0, 9, 58, 778549),
    datetime.datetime(2024, 1, 1, 0, 16, 6, 738090),
]
_ROWS_NS = [1704067798778549000, 1704068166738090000]


def _expected_collected(us: int) -> datetime.datetime:
    """What PySpark's collect() yields for an internal epoch-µs value:
    TimestampType.fromInternal converts via the OS-local zone, so the
    expectation must be built the same way (a literal naive datetime
    would only match on UTC machines)."""
    return datetime.datetime.fromtimestamp(us // 1_000_000).replace(
        microsecond=us % 1_000_000
    )


def _write_events(tmp_path, name: str, ts_array: pa.Array) -> str:
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([10, 11], pa.int64()),
            "event_type": pa.array(["view", "click"]),
            "value": pa.array([1.5, 2.5], pa.float64()),
            "props": pa.array(['{"a":1}', '{"b":2}']),
        }
    )
    path = str(tmp_path / name)
    pq.write_table(tbl, path)
    return path


@pytest.fixture(scope="module")
def both_shapes(spark, tmp_path_factory):
    """(µs-normalized rows, ns-normalized rows) from tiny in-test files."""
    tmp = tmp_path_factory.mktemp("events_shapes")
    us_dir = tmp / "us"
    ns_dir = tmp / "ns"
    us_dir.mkdir()
    ns_dir.mkdir()
    _write_events(us_dir, "events.parquet", pa.array(_ROWS_US, pa.timestamp("us")))
    _write_events(ns_dir, "events.parquet", pa.array(_ROWS_NS, pa.timestamp("ns")))
    us = table(spark, str(us_dir), "events")
    ns = table(spark, str(ns_dir), "events")
    return us, ns


def test_schemas_identical_across_shapes(both_shapes):
    us, ns = both_shapes
    assert [(f.name, f.dataType.simpleString()) for f in us.schema.fields] == [
        (f.name, f.dataType.simpleString()) for f in ns.schema.fields
    ]
    d = dict(us.dtypes)
    assert d["ts"] == "timestamp"
    assert d["ts_ns"] == "bigint"


def test_values_identical_across_shapes(both_shapes):
    us, ns = both_shapes
    rows_us = [r.asDict() for r in us.orderBy("event_id").collect()]
    rows_ns = [r.asDict() for r in ns.orderBy("event_id").collect()]
    assert rows_us == rows_ns
    assert rows_us[0]["ts_ns"] == _ROWS_NS[0]
    assert rows_us[0]["ts"] == _expected_collected(_US)


def test_current_fixture_loads(spark, sf_dir):
    """Whatever shape the driver shipped this round, the catalog loads it."""
    ev = table(spark, sf_dir, "events")
    d = dict(ev.dtypes)
    assert d["ts"] == "timestamp"
    assert d["ts_ns"] == "bigint"
    assert ev.limit(1).count() == 1


def test_unsupported_dtype_raises(spark, tmp_path):
    bad = tmp_path / "bad"
    bad.mkdir()
    _write_events(bad, "events.parquet", pa.array(["2024-01-01", "2024-01-02"]))
    with pytest.raises(TypeError, match="unsupported dtype"):
        table(spark, str(bad), "events")


def test_streaming_matches_batch(spark, sf_dir):
    """The streaming view of events must agree with the batch catalog
    column-for-column on the current fixture."""
    from hadoop_release_spark.streaming.runner import stream_events

    batch = table(spark, sf_dir, "events")
    stream = stream_events(spark, sf_dir)
    assert [(f.name, f.dataType.simpleString()) for f in stream.schema.fields] == [
        (f.name, f.dataType.simpleString()) for f in batch.schema.fields
    ]


@pytest.mark.parametrize("shape", ["us", "ns"])
def test_streaming_runs_on_both_shapes(spark, tmp_path_factory, shape):
    """The streaming runner must materialize identical results from
    either fixture shape — the flip-back path, end-to-end through a
    real availableNow stream, not just a schema check."""
    from pyspark.sql import functions as F

    from hadoop_release_spark.streaming.runner import materialize, stream_events

    d = tmp_path_factory.mktemp(f"stream_{shape}")
    arr = (
        pa.array(_ROWS_US, pa.timestamp("us"))
        if shape == "us"
        else pa.array(_ROWS_NS, pa.timestamp("ns"))
    )
    _write_events(d, "events.parquet", arr)
    out = materialize(
        stream_events(spark, str(d)).groupBy("user_id").agg(
            F.count("*").alias("n"), F.min("ts_ns").alias("first_ns")
        ),
        output_mode="complete",
    )
    rows = {r["user_id"]: r.asDict() for r in out.collect()}
    assert rows[10]["n"] == 1
    assert rows[10]["first_ns"] == _ROWS_NS[0]
