"""Query registry — the implementation of the SURVEY.md §2 contract.

Every operator the engine claims is registered here with:
  * ``name``     — the §2 row id (also the ``queries()`` key)
  * ``fn``       — ``(spark, sf_dir) -> DataFrame``, the Spark-first
                   implementation
  * ``oracle``   — equivalent DuckDB SQL over the fixture views, or
                   ``None`` for non-SQL-expressible ops (driver then
                   records a weaker rows-only check)
  * ``priority`` — P0/P1/P2 per SURVEY.md §2

The registry is the single source of truth: ``__spark_entry__.py``'s
``queries()`` / ``oracle_sql()`` are projections of it, and the test
suite parametrizes over it, so a query cannot be claimed without
being oracle-checked.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None
    priority: str
    doc: str = field(default="")


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, priority: str = "P1"):
    """Decorator registering a contract query implementation."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query id: {name}")
        _REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, priority=priority, doc=(fn.__doc__ or "").strip()
        )
        return fn

    return deco


def _ensure_loaded() -> None:
    # Import for side effect: each plans module registers its rows.
    from hadoop_release_spark import plans  # noqa: F401

    plans.load_all()


def specs() -> dict[str, QuerySpec]:
    _ensure_loaded()
    return dict(_REGISTRY)


def all_queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in specs().items()}


def all_oracles() -> dict[str, str]:
    return {name: spec.oracle for name, spec in specs().items() if spec.oracle is not None}
