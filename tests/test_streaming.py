"""Multi-batch streaming semantics the batch oracle can't see:
watermark late-data drops and append-mode window emission.

Each micro-batch is one parquet file (maxFilesPerTrigger=1, file
modification times force the discovery order)."""

from __future__ import annotations

import os
import time
import uuid

import pytest
from pyspark.sql import functions as F

from hadoop_release_spark.sources.roundtrip import scratch_dir


def _write_batch(spark, path: str, idx: int, rows: list[tuple[int, str, float]]):
    """rows: (event_id, ts string, value). One file per batch; mtime
    staggered so the file stream discovers batches in order."""
    df = spark.createDataFrame(rows, "event_id long, ts_s string, value double").select(
        "event_id", F.col("ts_s").cast("timestamp").alias("ts"), "value"
    )
    sub = f"{path}/b{idx}"
    df.coalesce(1).write.mode("overwrite").parquet(sub)
    base = time.time() - 1000 + idx * 10
    for f in os.listdir(sub):
        os.utime(f"{sub}/{f}", (base, base))


@pytest.fixture(scope="module")
def staged(spark):
    path = scratch_dir("stream-semantics")
    _write_batch(spark, path, 0, [(1, "2024-01-01 10:00:00", 1.0),
                                  (2, "2024-01-01 10:10:00", 2.0),
                                  (3, "2024-01-01 10:30:00", 3.0)])
    _write_batch(spark, path, 1, [(4, "2024-01-01 12:00:00", 4.0)])
    _write_batch(spark, path, 2, [(5, "2024-01-01 13:00:00", 5.0)])
    # Late straggler: 10:05 is far behind the watermark by now.
    _write_batch(spark, path, 3, [(6, "2024-01-01 10:05:00", 6.0)])
    return path


def _run(spark, staged_path: str, output_mode: str):
    stream = (
        spark.readStream.schema("event_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", True)
        .parquet(staged_path)
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count("*").alias("n"))
    )
    name = "sem_" + uuid.uuid4().hex[:10]
    q = (
        agg.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table(name)
        .select(F.date_format("window.start", "HH:mm").alias("w"), "n")
        .collect()
    )


def test_append_emits_closed_window_once_and_drops_late(spark, staged):
    rows = _run(spark, staged, "append")
    ten = [r for r in rows if r.w == "10:00"]
    # The 10:00 window closed when the watermark passed 11:00 — emitted
    # exactly once with the 3 on-time events; the late event 6 (10:05,
    # arriving after watermark 12:50) must NOT produce a second emission.
    assert len(ten) == 1, rows
    assert ten[0].n == 3, rows


def test_update_drops_late_event_from_state(spark, staged):
    rows = _run(spark, staged, "update")
    # Update mode re-emits a window per batch that changes it. The
    # 10:00 window may appear multiple times (batch 0 updates), but
    # never with the late event counted.
    ten_counts = {r.n for r in rows if r.w == "10:00"}
    assert 4 not in ten_counts, rows
    assert max(ten_counts) == 3, rows


def test_dedup_within_watermark_drops_dup_and_evicts_state(spark):
    """j05 semantics: a duplicate event_id arriving within the
    watermark is dropped, and dedup state is EVICTED once the
    watermark passes a key's event time — numRowsTotal must not grow
    with already-expired keys (the whole point of
    dropDuplicatesWithinWatermark over plain dropDuplicates)."""
    path = scratch_dir("dedup-evict")
    _write_batch(spark, path, 0, [(1, "2024-01-01 10:00:00", 1.0),
                                  (2, "2024-01-01 10:10:00", 2.0)])
    # Duplicate id=1 within the 10-minute watermark → dropped; id=3 at
    # 12:00 advances the watermark far past keys 1 and 2.
    _write_batch(spark, path, 1, [(1, "2024-01-01 10:02:00", 9.0),
                                  (3, "2024-01-01 12:00:00", 3.0)])
    _write_batch(spark, path, 2, [(4, "2024-01-01 13:00:00", 4.0)])
    stream = (
        spark.readStream.schema("event_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", True)
        .parquet(path)
    )
    deduped = stream.withWatermark("ts", "10 minutes").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    name = "dedup_" + uuid.uuid4().hex[:10]
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table(name).collect()
    got = sorted((r.event_id, r.value) for r in rows)
    # Each id exactly once, duplicate's value (9.0) never emitted.
    assert got == [(1, 1.0), (2, 2.0), (3, 3.0), (4, 4.0)], rows
    # By the final batch the watermark (11:50) has passed keys 1 and 2
    # (expire at event_time + delay ≤ 10:20): state holds at most the
    # two live keys. Plain dropDuplicates would report 4 here.
    state = [p["stateOperators"][0]["numRowsTotal"]
             for p in q.recentProgress if p.get("stateOperators")]
    assert state and state[-1] <= 2, state


def test_stream_stream_join_across_batches(spark):
    """j10 semantics across micro-batches: a click arriving in a
    LATER batch still joins views buffered from an earlier batch
    (that buffering is the join state), while a view older than the
    join's time bound never pairs. Uses (event_type, ts, user_id)
    rows shaped like the events fixture."""
    path = scratch_dir("ss-join")

    def write(idx, rows):
        df = spark.createDataFrame(
            rows, "event_id long, ts_s string, user_id long, event_type string"
        ).select(
            "event_id", F.col("ts_s").cast("timestamp").alias("ts"),
            "user_id", "event_type",
        )
        sub = f"{path}/b{idx}"
        df.coalesce(1).write.mode("overwrite").parquet(sub)
        base = time.time() - 1000 + idx * 10
        for f in os.listdir(sub):
            os.utime(f"{sub}/{f}", (base, base))

    # batch 0: two views for user 1 — one recent, one far too old.
    write(0, [(10, "2024-01-01 09:50:00", 1, "view"),
              (11, "2024-01-01 06:00:00", 1, "view")])
    # batch 1: the click; joins view 10 (within 1 h) but not view 11.
    write(1, [(20, "2024-01-01 10:00:00", 1, "click")])

    def side(tp, id_alias, ts_alias):
        return (
            spark.readStream.schema(
                "event_id long, ts timestamp, user_id long, event_type string"
            )
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", True)
            .parquet(path)
            .filter(F.col("event_type") == tp)
            .withWatermark("ts", "1 hour")
            .select(
                F.col("event_id").alias(id_alias),
                F.col("ts").alias(ts_alias),
                F.col("user_id").alias(f"{id_alias}_user"),
            )
        )

    clicks = side("click", "click_id", "c_ts")
    views = side("view", "view_id", "v_ts")
    joined = clicks.join(
        views,
        (F.col("click_id_user") == F.col("view_id_user"))
        & (F.col("v_ts") >= F.col("c_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("v_ts") <= F.col("c_ts")),
        "inner",
    )
    name = "ssj_" + uuid.uuid4().hex[:10]
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table(name).select("click_id", "view_id").collect()
    got = sorted((r.click_id, r.view_id) for r in rows)
    assert got == [(20, 10)], rows


def test_checkpoint_restart_resumes_not_reprocesses(spark):
    """Stop a checkpointed stream, add data, restart with the same
    checkpoint: the final state covers ALL data but the second run
    reads only the NEW file (exactly-once resume, not replay)."""
    data_dir = scratch_dir("ckpt-data")
    ckpt = scratch_dir("ckpt-loc")
    out: dict[str, int] = {}

    def write_batch(batch_df, epoch_id):
        for r in batch_df.collect():
            out[r["event_type"]] = r["n"]

    def run_once():
        stream = (
            spark.readStream.schema("event_id long, ts timestamp, event_type string")
            .option("recursiveFileLookup", True)
            .parquet(data_dir)
        )
        agg = stream.groupBy("event_type").agg(F.count("*").alias("n"))
        q = (
            agg.writeStream.outputMode("complete")
            .foreachBatch(write_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return q

    def write_file(idx, rows):
        df = spark.createDataFrame(rows, "event_id long, ts_s string, event_type string").select(
            "event_id", F.col("ts_s").cast("timestamp").alias("ts"), "event_type"
        )
        df.coalesce(1).write.mode("overwrite").parquet(f"{data_dir}/f{idx}")

    write_file(0, [(1, "2024-01-01 10:00:00", "click"), (2, "2024-01-01 10:01:00", "view")])
    q1 = run_once()
    assert out == {"click": 1, "view": 1}

    write_file(1, [(3, "2024-01-01 10:02:00", "click")])
    q2 = run_once()
    assert out == {"click": 2, "view": 1}
    # The restarted run consumed only the new file's rows.
    progresses = [p for p in q2.recentProgress if p["numInputRows"] > 0]
    assert sum(p["numInputRows"] for p in progresses) == 1, progresses


def _write_user_batch(spark, path, idx, rows):
    """rows: (user_id, value). One file per batch, mtime-ordered."""
    df = spark.createDataFrame(rows, "user_id long, value double")
    sub = f"{path}/b{idx}"
    df.coalesce(1).write.mode("overwrite").parquet(sub)
    base = time.time() - 1000 + idx * 10
    for f in os.listdir(sub):
        os.utime(f"{sub}/{f}", (base, base))


def test_stateful_state_carries_across_batches(spark):
    """j06's applyInPandasWithState core must CARRY state across
    micro-batches — the one behavior the single-batch oracle bridge
    cannot see: user 1 appears in batches 0 and 2, so its final
    update must report the cumulative (3 events, 6.0), not a
    per-batch restart."""
    from hadoop_release_spark.plans.j_streaming import stateful_user_totals

    path = scratch_dir("stateful-carry")
    _write_user_batch(spark, path, 0, [(1, 1.0), (1, 2.0), (2, 10.0)])
    _write_user_batch(spark, path, 1, [(2, 20.0)])
    _write_user_batch(spark, path, 2, [(1, 3.0)])
    stream = (
        spark.readStream.schema("user_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", True)
        .parquet(path)
    )
    result = stateful_user_totals(stream)
    name = "sem_" + uuid.uuid4().hex[:10]
    q = (
        result.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table(name).collect()
    # update mode emits one row per (user, batch-with-activity); the
    # MAX per user is the final cumulative state
    final = {}
    for r in rows:
        cur = final.get(r["user_id"])
        if cur is None or r["n_events"] > cur[0]:
            final[r["user_id"]] = (r["n_events"], r["sum_value"])
    assert final[1] == (3, 6.0), final      # 2 in batch 0 + 1 in batch 2
    assert final[2] == (2, 30.0), final     # across batches 0 and 1
    # and state DID span batches: user 1 must have >1 emission
    assert sum(1 for r in rows if r["user_id"] == 1) > 1, rows


def test_stream_events_directory_shaped_fixture(spark, sf_dir):
    """Fixture-regeneration guard (self-review find): if the driver
    rewrites events.parquet as a DIRECTORY of part files, the stream
    source must still read every row — the old leaf-name glob
    matched zero part files and yielded a silently EMPTY stream."""
    from hadoop_release_spark.catalog import table
    from hadoop_release_spark.streaming.runner import materialize, stream_events

    batch = table(spark, sf_dir, "events").drop("ts_ns")
    n_batch = batch.count()
    tmp = scratch_dir("dirshape")
    # events.parquet as a directory with MULTIPLE part files
    batch.repartition(3).write.mode("overwrite").parquet(f"{tmp}/events.parquet")
    streamed = materialize(
        stream_events(spark, tmp).groupBy().count(), output_mode="complete"
    )
    assert streamed.collect()[0]["count"] == n_batch


def test_session_gap_boundary_exact_gap_merges(spark):
    """j03 boundary pin (self-review find, verified empirically):
    Spark's session_window MERGES two events exactly 30:00 apart;
    one microsecond past the gap splits. The oracle's strict `>`
    must agree on both planted cases."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq
    import datetime
    import shutil
    import tempfile

    from hadoop_release_spark.plans.registry import specs

    t0 = datetime.datetime(2024, 3, 1, 10, 0, 0)
    for extra_us, want_sessions in ((0, 1), (1, 2)):
        tmp = tempfile.mkdtemp(prefix="j03_gap_")
        try:
            t1 = t0 + datetime.timedelta(minutes=30, microseconds=extra_us)
            tbl = pa.table(
                {
                    "event_id": pa.array([1, 2], pa.int64()),
                    "ts": pa.array([t0, t1], pa.timestamp("us")),
                    "user_id": pa.array([1, 1], pa.int64()),
                    "event_type": pa.array(["view", "view"]),
                    "value": pa.array([1.0, 1.0], pa.float64()),
                    "props": pa.array(["{}"] * 2),
                }
            )
            pq.write_table(tbl, f"{tmp}/events.parquet")
            spark_rows = specs()["j03_stream_session"].fn(spark, tmp).collect()
            con = duckdb.connect()
            con.execute(
                f"CREATE VIEW events AS SELECT * FROM read_parquet('{tmp}/events.parquet')"
            )
            oracle_rows = con.execute(specs()["j03_stream_session"].oracle).fetchall()
            assert len(spark_rows) == want_sessions, (extra_us, spark_rows)
            assert len(oracle_rows) == want_sessions, (extra_us, oracle_rows)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)


def test_dedup_state_evicts_exactly_at_watermark_boundary(spark):
    """j05's eviction BOUNDARY, pinned empirically (round-5 verdict
    item 6): a dedup key whose expiry (event time + delay) EQUALS the
    current watermark is evicted — eviction is >=, not > (probed on
    this Spark build; a regression to strict-> would keep the key and
    show 2 state rows in the third batch). Also pins the companion
    rule that makes the boundary unobservable through emissions
    alone: a duplicate BELOW the watermark is dropped as late data
    before the dedup operator ever sees it, so the observable is the
    state-store row count, not the output."""
    path = scratch_dir("dedup-boundary")
    # b0: key 1 at 10:00 (expiry = 10:10 with a 10-minute delay).
    _write_batch(spark, path, 0, [(1, "2024-01-01 10:00:00", 1.0)])
    # b1: watermark advances to EXACTLY 10:10 (= 10:20 - 10 min).
    _write_batch(spark, path, 1, [(9, "2024-01-01 10:20:00", 9.0)])
    # b2: late duplicate of key 1 below the watermark → dropped as
    # late data; key 1's state row must be GONE this batch (== case).
    _write_batch(spark, path, 2, [(1, "2024-01-01 10:05:00", 5.0)])
    stream = (
        spark.readStream.schema("event_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", True)
        .parquet(path)
    )
    deduped = stream.withWatermark("ts", "10 minutes").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    name = "dedupb_" + uuid.uuid4().hex[:10]
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted((r.event_id, r.value) for r in spark.table(name).collect())
    assert got == [(1, 1.0), (9, 9.0)], got  # late dup never emitted
    state = [p["stateOperators"][0]["numRowsTotal"]
             for p in q.recentProgress if p.get("stateOperators")]
    # Batches: [key1] → [key1, key9] → [key9 only]: the ==-boundary
    # eviction. 2 in the final batch would mean strict-> semantics.
    assert state[-1] == 1, state


def test_tws_twin_matches_applyinpandas_semantics(spark):
    """j11 (transformWithStateInPandas) must produce the SAME final
    per-user totals as j06's applyInPandasWithState core over the
    same multi-batch stream — the two arbitrary-state APIs are twins,
    not alternatives with different semantics. Skip-marked where the
    modern API's runtime dependency (google.protobuf) is absent; the
    probe-gated registration (j_streaming.tws_available) keeps the
    contract row out of queries() in exactly the same case."""
    from hadoop_release_spark.plans.j_streaming import (
        stateful_user_totals,
        stateful_user_totals_tws,
        tws_available,
    )

    if not tws_available():
        pytest.skip(
            "google.protobuf absent: transformWithStateInPandas "
            "worker cannot start in this container"
        )

    path = scratch_dir("tws-twin")
    batches = [
        [(1, "2024-01-01 10:00:00", 1.5), (2, "2024-01-01 10:01:00", 2.0)],
        [(1, "2024-01-01 10:05:00", 3.25)],
        [(2, "2024-01-01 10:06:00", -1.0), (3, "2024-01-01 10:07:00", 7.0)],
    ]
    for i, rows in enumerate(batches):
        _write_batch(spark, path, i, rows)

    def run(core_fn):
        stream = (
            spark.readStream.schema("event_id long, ts timestamp, value double")
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", True)
            .parquet(path)
            .select(F.col("event_id").alias("user_id"), "value")
        )
        name = "tws_" + uuid.uuid4().hex[:10]
        q = (
            core_fn(stream)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # update mode re-emits per batch: keep each user's LAST row.
        final = {}
        for r in spark.table(name).collect():
            final[r.user_id] = (r.n_events, r.sum_value)
        return final

    assert run(stateful_user_totals) == run(stateful_user_totals_tws)


def test_dynamic_session_gap_depends_on_event_type(spark):
    """j12 semantics: a 20-minute silence after a 'view' (10-min gap)
    SPLITS the session, while the same silence after a 'click'
    (30-min gap) MERGES — the gap is the PRECEDING event's, which is
    what distinguishes dynamic session_window from j03's fixed gap."""
    import pandas as pd

    from hadoop_release_spark.streaming.runner import (
        materialize,
        scoped_stream_partitions,  # noqa: F401
    )

    def run(event_type):
        df = spark.createDataFrame(
            [
                (1, "2024-01-01 10:00:00", event_type),
                (2, "2024-01-01 10:20:00", "view"),
            ],
            "event_id long, ts_s string, event_type string",
        ).select(
            "event_id",
            F.col("ts_s").cast("timestamp").alias("ts"),
            "event_type",
            F.lit(7).alias("user_id"),
        )
        path = scratch_dir(f"dyn-gap-{event_type}")
        df.coalesce(1).write.mode("overwrite").parquet(path)
        stream = spark.readStream.schema(
            "event_id long, ts timestamp, event_type string, user_id long"
        ).parquet(path)
        gap = F.when(F.col("event_type") == "view", F.lit("10 minutes")).otherwise(
            F.lit("30 minutes")
        )
        agg = stream.groupBy(F.session_window("ts", gap), "user_id").agg(
            F.count("*").alias("n")
        )
        out = materialize(agg, output_mode="complete")
        return sorted(r.n for r in out.collect())

    assert run("view") == [1, 1]    # 10-min gap expired → two sessions
    assert run("click") == [2]      # 30-min gap still open → one session


def test_token_bucket_state_carries_across_batches(spark):
    """j13's bucket state must CARRY across micro-batches and the
    resumed recurrence must equal the single-batch k12 replay
    bit-for-bit: the same time-ordered events, split across three
    files and streamed one file per trigger, must admit/reject
    identically to token_bucket_admission run once over the whole
    sequence. Events are costed at 1 token (value 1.00 -> 100 cents,
    100 % 5 = 0 -> cost 1) with gaps sized so the bucket both drains
    (burst) and refills (long gap spanning a batch boundary) —
    a parameterization where per-batch state restarts would admit
    MORE events than the carried replay."""
    import uuid as _uuid

    import numpy as np

    from hadoop_release_spark.plans.j_streaming import stateful_token_bucket
    from hadoop_release_spark.plans.k_udfs import (
        K12_CAP_U,
        K12_RATE_UT_PER_US,
        K12_TOKEN_US,
        token_bucket_admission,
    )

    hour_us = 3_600_000_000
    t0 = 1_700_000_000_000_000
    # burst of 12 one-token events in one minute (drains the 10-cap),
    # then a 20 h gap (refills 5 tokens), then another burst of 8 —
    # split so the gap straddles the batch-1/batch-2 boundary.
    times = [t0 + i * 60_000_000 for i in range(12)] + [
        t0 + 20 * hour_us + i * 60_000_000 for i in range(8)
    ]
    rows = [(1, i, t, 1.00) for i, t in enumerate(times)]

    path = scratch_dir("bucket-carry")
    for bidx, chunk in enumerate([rows[:5], rows[5:12], rows[12:]]):
        df = spark.createDataFrame(
            [(u, e, t, v) for u, e, t, v in chunk],
            "user_id long, event_id long, tus long, value double",
        ).selectExpr(
            "user_id", "event_id", "timestamp_micros(tus) AS ts", "value"
        )
        sub = f"{path}/b{bidx}"
        df.coalesce(1).write.mode("overwrite").parquet(sub)
        base = time.time() - 1000 + bidx * 10
        for f in os.listdir(sub):
            os.utime(f"{sub}/{f}", (base, base))

    stream = (
        spark.readStream.schema(
            "user_id long, event_id long, ts timestamp, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", True)
        .parquet(path)
    )
    result = stateful_token_bucket(stream)
    name = "j13c_" + _uuid.uuid4().hex[:10]
    q = (
        result.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["event_id"]: (r["admitted"], r["tokens_after_u"])
        for r in spark.table(name).collect()
    }

    tus = np.array(times, dtype=np.int64)
    cost = np.full(len(times), K12_TOKEN_US, dtype=np.int64)
    admitted, after = token_bucket_admission(
        tus, cost, K12_CAP_U, K12_RATE_UT_PER_US
    )
    want = {
        i: (int(admitted[i]), int(after[i])) for i in range(len(times))
    }
    assert got == want, (got, want)
    # the parameterization is non-vacuous: some rejections happened,
    # and the post-gap burst was only partially admitted (refill
    # capped below full) — a per-batch restart would differ.
    assert sum(a for a, _ in want.values()) < len(times)
    post_gap_admits = sum(want[i][0] for i in range(12, len(times)))
    assert 0 < post_gap_admits < 8, want
