"""Physical-plan assertions: the scale posture is checked, not assumed.

These pin the Catalyst behaviors the engine's 100 TB design relies
on (SURVEY.md §4): map-side partial aggregation (the combiner),
broadcast joins for bounded dims, parquet predicate pushdown, column
pruning, and top-k fusion.
"""

from __future__ import annotations

from hadoop_release_spark.plans.registry import specs


def _plan(spark, sf_dir, name: str) -> str:
    df = specs()[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(spark, sf_dir, name: str) -> str:
    df = specs()[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_combiner_two_phase_agg(spark, sf_dir):
    # i05: partial (map-side) + final HashAggregate = Hadoop combiner.
    plan = _plan(spark, sf_dir, "i05_mr_combiner")
    assert plan.count("HashAggregate") >= 2, plan


def test_broadcast_join_used(spark, sf_dir):
    for name in ("c02_join_broadcast", "i06_mr_distcache_join", "c13_join_star"):
        plan = _plan(spark, sf_dir, name)
        assert "BroadcastHashJoin" in plan, f"{name}: no broadcast join\n{plan}"


def test_filter_pushed_to_parquet(spark, sf_dir):
    plan = _plan(spark, sf_dir, "b03_filter_comparison")
    assert "PushedFilters" in plan and "GreaterThan(l_quantity,30" in plan, plan


def test_column_pruning(spark, sf_dir):
    # b01 projects 4 columns; the parquet ReadSchema must not include
    # unreferenced measures like l_extendedprice.
    plan = _plan(spark, sf_dir, "b01_project_columns")
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema, plan
    assert "l_extendedprice" not in read_schema[0], read_schema[0]


def test_topk_fused(spark, sf_dir):
    plan = _plan(spark, sf_dir, "f02_topk_global")
    assert "TakeOrderedAndProject" in plan, plan


def test_semi_anti_rewrites(spark, sf_dir):
    assert "LeftSemi" in _optimized(spark, sf_dir, "c07_join_semi")
    assert "LeftAnti" in _optimized(spark, sf_dir, "c08_join_anti")
