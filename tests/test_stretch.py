"""Accuracy bounds for the approximate (rows-only) operators.

Each bound is the operator's PUBLISHED error contract (the configured
sketch precision), not an ad-hoc tolerance: s01 asserts the ±3σ
envelope of the configured rsd, s02 asserts the rank-error guarantee
(value must fall between exact quantiles at φ ± 10/accuracy), s06
asserts ±3·RSE of DataSketches HLL at Spark's default lgConfigK.
"""

from __future__ import annotations

import statistics

from pyspark.sql import functions as F

from hadoop_release_spark.catalog import table
from hadoop_release_spark.plans.registry import specs
from hadoop_release_spark.plans.s_stretch import S01_RSD, S02_ACCURACY, S06_HLL_RSE


def test_approx_count_distinct_within_published_rsd(spark, sf_dir):
    approx = {
        r.l_returnflag: (r.approx_parts, r.approx_orders)
        for r in specs()["s01_approx_count_distinct"].fn(spark, sf_dir).collect()
    }
    exact = {
        r.l_returnflag: (r.p, r.o)
        for r in table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("p"), F.countDistinct("l_orderkey").alias("o"))
        .collect()
    }
    errs = []
    for flag, (ap, ao) in approx.items():
        ep, eo = exact[flag]
        errs += [abs(ap - ep) / ep, abs(ao - eo) / eo]
        # per-estimate: the ±3σ envelope of the configured rsd
        assert abs(ap - ep) / ep < 3 * S01_RSD, (flag, ap, ep)
        assert abs(ao - eo) / eo < 3 * S01_RSD, (flag, ao, eo)
    # in aggregate the estimator must actually achieve its precision:
    # the median error across estimates sits inside ~1.5σ
    assert statistics.median(errs) < 1.5 * S01_RSD, errs


def test_percentile_approx_within_published_rank_error(spark, sf_dir):
    """The published percentile_approx contract is a RANK bound: the
    returned value's rank is within ±n/accuracy of the target. Assert
    it directly — the approx value must fall between the exact
    quantiles at φ ± eps, with eps = 10/accuracy (10× slack absorbs
    partial-sketch merges) + 2/n (the sketch returns an actual data
    element while exact percentile() interpolates, so the bracket
    must span at least one rank step of the group)."""
    approx = {
        r.o_orderstatus: (r.approx_median, r.approx_p95)
        for r in specs()["s02_percentile_approx"].fn(spark, sf_dir).collect()
    }
    counts = {
        r.o_orderstatus: r.n
        for r in table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    o = table(spark, sf_dir, "orders")
    for status, (am, ap95) in approx.items():
        eps = 10.0 / S02_ACCURACY + 2.0 / counts[status]
        q = (
            o.filter(F.col("o_orderstatus") == status)
            .agg(
                F.expr(
                    f"percentile(o_totalprice, array({0.5 - eps}, {0.5 + eps},"
                    f" {0.95 - eps}, {min(0.95 + eps, 1.0)}))"
                ).alias("q")
            )
            .collect()[0]
            .q
        )
        med_lo, med_hi, p95_lo, p95_hi = q
        assert med_lo <= am <= med_hi, (status, am, med_lo, med_hi)
        assert p95_lo <= ap95 <= p95_hi, (status, ap95, p95_lo, p95_hi)


def test_sample_seeded_reproducible_and_sized(spark, sf_dir):
    fn = specs()["s03_sample_seeded"].fn
    a = sorted(r.l_orderkey * 100 + r.l_linenumber for r in fn(spark, sf_dir).collect())
    b = sorted(r.l_orderkey * 100 + r.l_linenumber for r in fn(spark, sf_dir).collect())
    assert a == b  # fixed seed + same partitioning → reproducible
    total = table(spark, sf_dir, "lineitem").count()
    assert 0.05 * total < len(a) < 0.15 * total


def test_sequencefile_roundtrip_lossless(spark, sf_dir):
    out = {
        (r.n_nationkey, r.n_name)
        for r in specs()["s04_sequencefile_roundtrip"].fn(spark, sf_dir).collect()
    }
    src = {
        (r.n_nationkey, r.n_name)
        for r in table(spark, sf_dir, "nation").select("n_nationkey", "n_name").collect()
    }
    assert out == src


def test_pipe_external_matches_native(spark, sf_dir):
    out = {
        (r.doc_id, r.lang_upper)
        for r in specs()["s05_pipe_external"].fn(spark, sf_dir).collect()
    }
    src = {
        (r.doc_id, r.lang.upper())
        for r in table(spark, sf_dir, "documents").select("doc_id", "lang").collect()
    }
    assert out == src


def test_accumulator_counters_side_channel(spark, sf_dir):
    # The Hadoop counters side-channel: accumulators aggregate task-
    # side increments on the driver (i07's conditional aggregation is
    # the dataflow-native form; this pins the side-channel works too).
    acc = spark.sparkContext.accumulator(0)
    docs = table(spark, sf_dir, "documents").select("lang")

    def count_en(row):
        if row.lang == "en":
            acc.add(1)

    docs.foreach(count_en)
    exact = docs.filter(docs.lang == "en").count()
    assert acc.value == exact


def test_hll_sketch_union_accuracy(spark, sf_dir):
    # s06: each per-flag estimate and the UNIONED global estimate
    # must land within HLL's error envelope of the exact counts —
    # and the union must be computed from the sketches, which this
    # checks behaviorally: the ALL row ≈ distinct orders overall,
    # not the sum of the per-flag rows (orders span flags).
    from pyspark.sql import functions as F

    rows = {
        r.l_returnflag: r.est_orders
        for r in specs()["s06_hll_sketch_union"].fn(spark, sf_dir).collect()
    }
    li = table(spark, sf_dir, "lineitem")
    exact_all = li.select("l_orderkey").distinct().count()
    exact_per = {
        r.l_returnflag: r.n
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("n"))
        .collect()
    }
    for flag, exact in exact_per.items():
        # ±3·RSE of DataSketches HLL at the default lgConfigK=12
        assert abs(rows[flag] - exact) / exact < 3 * S06_HLL_RSE, (flag, rows[flag], exact)
    assert abs(rows["ALL"] - exact_all) / exact_all < 3 * S06_HLL_RSE, (
        rows["ALL"],
        exact_all,
    )
    assert rows["ALL"] < sum(v for k, v in rows.items() if k != "ALL")


def test_compaction_reduces_files_preserves_rows(spark, sf_dir):
    # a10: the compacted dataset must really be fewer files (not just
    # a re-read) and carry identical rows.
    import glob as _glob

    from hadoop_release_spark.sources.roundtrip import scratch_dir

    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    frag, comp = scratch_dir("t-frag"), scratch_dir("t-comp")
    n.repartition(20).write.mode("overwrite").parquet(frag)
    spark.read.parquet(frag).repartition(2).write.mode("overwrite").parquet(comp)
    n_frag = len(_glob.glob(f"{frag}/part-*"))
    n_comp = len(_glob.glob(f"{comp}/part-*"))
    assert n_frag == 20 and n_comp == 2, (n_frag, n_comp)
    assert sorted(map(tuple, spark.read.parquet(comp).collect())) == sorted(
        map(tuple, n.collect())
    )


def test_stream_reader_partitions_tile_the_offset_range(sf_dir):
    """s10's split planner must tile any [start, end) offset range
    exactly — no gap, no overlap, no empty split — or the
    exactly-once group counts the oracle certifies would break."""
    from hadoop_release_spark.sources.pydatasource import DocumentsStreamReader

    r = DocumentsStreamReader(
        {"path": f"{sf_dir}/documents.parquet", "numPartitions": "4"}
    )
    for lo, hi in [(0, 1), (0, 7), (3, 50), (10, 11), (0, r.n)]:
        parts = r.partitions({"pos": lo}, {"pos": hi})
        assert parts, (lo, hi)
        assert parts[0].start == lo and parts[-1].end == hi
        for a, b in zip(parts, parts[1:]):
            assert a.end == b.start, (lo, hi)
        assert all(p.start < p.end for p in parts)


def test_stream_reader_read_returns_exact_row_range(spark, sf_dir):
    """s10's executor-side read(): a [start, end) split must yield
    exactly that row range's records (pyarrow ground truth) — the
    row-group trim is where an off-by-one would silently duplicate
    or drop boundary rows across micro-batches."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hadoop_release_spark.sources.pydatasource import (
        DocumentsStreamReader,
        RowRangePartition,
    )

    path = f"{sf_dir}/documents.parquet"
    full = pq.read_table(path, columns=["doc_id"]).column("doc_id").to_pylist()
    r = DocumentsStreamReader({"path": path, "numPartitions": "4"})
    for lo, hi in [(0, 5), (3, 17), (len(full) - 7, len(full))]:
        batches = list(r.read(RowRangePartition(lo, hi)))
        got = pa.Table.from_batches(batches).column("doc_id").to_pylist()
        assert got == full[lo:hi], (lo, hi)


def test_countmin_estimate_is_one_sided(spark, sf_dir):
    """CMS guarantee: estimate ≥ true count for EVERY key (an
    estimate below truth means the hash rows disagree with the build
    — a broken sketch, not just a loose one)."""
    from hadoop_release_spark.plans.registry import specs

    rows = specs()["s11_countmin_sketch"].fn(spark, sf_dir).collect()
    assert rows
    bad = [r for r in rows if r.cms_estimate < r.true_count]
    assert not bad, bad[:5]
