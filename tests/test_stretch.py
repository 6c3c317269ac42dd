"""Accuracy bounds for the approximate (rows-only) operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_release_spark.catalog import table
from hadoop_release_spark.plans.registry import specs


def test_approx_count_distinct_within_5pct(spark, sf_dir):
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
    for flag, (ap, ao) in approx.items():
        ep, eo = exact[flag]
        assert abs(ap - ep) / ep < 0.05, (flag, ap, ep)
        assert abs(ao - eo) / eo < 0.05, (flag, ao, eo)


def test_percentile_approx_brackets_exact(spark, sf_dir):
    approx = {
        r.o_orderstatus: r.approx_median
        for r in specs()["s02_percentile_approx"].fn(spark, sf_dir).collect()
    }
    exact = {
        r.o_orderstatus: r.m
        for r in table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.median("o_totalprice").alias("m"))
        .collect()
    }
    for status, am in approx.items():
        assert abs(am - exact[status]) / exact[status] < 0.02, (status, am, exact[status])


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
        assert abs(rows[flag] - exact) / exact < 0.05, (flag, rows[flag], exact)
    assert abs(rows["ALL"] - exact_all) / exact_all < 0.05, (rows["ALL"], exact_all)
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
