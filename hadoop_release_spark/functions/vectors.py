"""Vector expressions over ``array<float>`` embedding columns.

All JVM-side higher-order functions (no Python in the hot path):
float components cast to double element-wise (exact), folded
sequentially. The DuckDB oracle mirrors use explicit
``list_transform(range(...))`` double arithmetic rather than
``list_cosine_similarity`` so both engines run the same summation in
the same order (the builtin may compute in float32, which would
drift against a 3-decimal rounding grid).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ a_i * b_i with per-element double casts, sequential fold."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm2(a: Column) -> Column:
    """L2 norm: sqrt(Σ a_i²)."""
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity dot/(|a||b|)."""
    return dot(a, b) / (norm2(a) * norm2(b))


def o_dot(a: str, b: str, dim: int) -> str:
    """DuckDB mirror of :func:`dot` (explicit double, fixed dim)."""
    return (
        f"list_sum(list_transform(range(1, {dim + 1}), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    )


def o_norm2(a: str, dim: int) -> str:
    """DuckDB mirror of :func:`norm2`."""
    return (
        f"sqrt(list_sum(list_transform(range(1, {dim + 1}), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE))))"
    )


def o_cosine(a: str, b: str, dim: int) -> str:
    """DuckDB mirror of :func:`cosine`."""
    return f"({o_dot(a, b, dim)} / ({o_norm2(a, dim)} * {o_norm2(b, dim)}))"


def sq_dist(a: Column, b: Column) -> Column:
    """Σ (a_i − b_i)² with per-element double casts, sequential fold
    (same order as :func:`dot`, so the DuckDB mirror below is
    bit-identical)."""
    return F.aggregate(
        F.zip_with(
            a, b, lambda x, y: (x.cast("double") - y.cast("double")) ** 2
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def o_sq_dist_offset(a: str, b: str, a_off: str, b_off: str, subdim: int) -> str:
    """DuckDB mirror of :func:`sq_dist` over aligned SLICES: compares
    ``a[a_off+1 .. a_off+subdim]`` with ``b[b_off+1 .. b_off+subdim]``
    (offsets are SQL expressions, e.g. ``u*16``). Fold order is the
    ascending element order, matching a Spark ``F.slice`` +
    :func:`sq_dist` of the same ranges."""
    return (
        f"list_sum(list_transform(range(1, {subdim + 1}), "
        f"i -> (CAST({a}[{a_off} + i] AS DOUBLE) - "
        f"CAST({b}[{b_off} + i] AS DOUBLE)) ** 2))"
    )
