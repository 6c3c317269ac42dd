"""Oracle-parity test for every registered contract query.

Parametrizes over the full query registry — exactly what the driver
grades — so adding an operator automatically adds its gate here.
"""

from __future__ import annotations

import pytest

from hadoop_release_spark.plans.registry import specs
from tests._harness import compare

ALL_SPECS = sorted(specs().values(), key=lambda s: s.name)


def test_registry_nonempty():
    assert len(ALL_SPECS) > 0


@pytest.mark.parametrize("spec", ALL_SPECS, ids=lambda s: s.name)
def test_oracle_parity(spec, spark, oracle, sf_dir):
    df = spec.fn(spark, sf_dir)
    if spec.oracle is None:
        # Rows-only contract (non-SQL-expressible op): schema must be
        # stable and the query must execute.
        assert df.count() >= 0
        assert len(df.columns) > 0
    else:
        compare(df, spec.oracle, oracle)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    keys = set(e.queries())
    oracles = set(e.oracle_sql())
    assert oracles <= keys, "oracle_sql keys must be a subset of queries keys"
