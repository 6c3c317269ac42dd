"""Oracle-portability helpers (SURVEY.md §2 contract-safety rules).

These encode the verified Spark↔DuckDB semantic gotchas once, so
individual queries never re-derive them.

THE FLOAT RULE (verified in this environment): Spark ``round`` is
string-based (shortest-repr → BigDecimal HALF_UP) while DuckDB's is
exact-binary, so rounding an inexact double near a boundary DIVERGES
between engines. Therefore every float a contract query emits must be
a *deterministically computed* double:

  * ``round(x, k)`` is only safe when the true decimal value of x has
    ≤ k decimals (fixture measures are 2dp; products of m such terms
    have ≤ 2m dp) — then both engines land on the same grid point.
  * sums of doubles → :func:`dsum` (exact DECIMAL accumulation, one
    deterministic cast back to double).
  * averages → :func:`davg` (= dsum/count, IEEE-identical in both
    engines), never ``round(avg(x))``.
  * products of measures (round-3 sf0.1 finding, see d12): the
    double PRODUCT is inexact and the two engines' double→decimal
    casts disagree by ±1 ulp per row — a drift that grows with row
    count (Σx² was green at sf0.01, off by ~3e-3 at sf0.1). Recover
    each factor's exact decimal FIRST (a 2dp measure casts to
    DECIMAL(12,2) identically in both engines), multiply in decimal,
    and transport any sum wider than 14 significant digits as a
    fixed-scale decimal STRING — decimal→double is not
    cross-engine-identical past 15 digits.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Exact-accumulation type: 8 fractional digits covers every contract
#: expression (≤6 true dp), 17 integral digits ≫ any sf0.1 sum.
_DEC = "decimal(25,8)"
_ODEC = "DECIMAL(25,8)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def ts_us(col: Column | str) -> Column:
    """Timestamp → epoch microseconds (bigint), the portable hashed form.

    With the session pinned to UTC, ``timestamp_ntz`` wall-clock casts
    to the identical instant, so this equals DuckDB's
    ``CAST(epoch_us(col) AS BIGINT)``.
    """
    return F.unix_micros(_c(col).cast("timestamp"))


def r3(col: Column) -> Column:
    """Round to 3 decimals — for float32-derived similarity scores
    (computation noise ~1e-11 ≪ the 5e-4 half-grid)."""
    return F.round(col, 3)


def r2(col: Column) -> Column:
    """Round to 2 decimals — safe only for ≤2-true-dp expressions."""
    return F.round(col, 2)


def r4(col: Column) -> Column:
    """Round to 4 decimals — safe only for ≤4-true-dp expressions."""
    return F.round(col, 4)


def r6(col: Column) -> Column:
    """Round to 6 decimals — safe only for ≤6-true-dp expressions.

    SIGNED-ZERO RULE (the d27 single-type-day case): Spark's round
    goes through BigDecimal, which has NO signed zero, so a tiny
    negative residual (−2e-16) rounds to +0.0 — but DuckDB's round
    is exact-binary and returns −0.0, and the compare canon
    distinguishes the two. Any ORACLE that rounds an expression
    whose true value can be a tiny negative (entropies,
    correlations, deviations, NLL differences) must append
    ``+ 0.0`` after its round(...) — IEEE (−0.0)+0.0 = +0.0 and
    every other value is unchanged. The Spark side needs nothing
    (d27/d30/d31/l43 oracles carry the normalization)."""
    return F.round(col, 6)


def dsum(col: Column | str) -> Column:
    """Deterministic cross-engine sum of a double column.

    A plain double sum over ~10^5 rows accumulates order-dependent
    error that can exceed any rounding grid. Instead:

    1. cast each value to exact ``DECIMAL(25,8)`` (exact for
       ≤8-true-dp inputs; the binary noise of a 2dp double is ~1e-11,
       far inside the 5e-9 half-grid, so both engines produce the
       identical decimal),
    2. sum exactly (order-independent),
    3. round the decimal total to 4dp IN DECIMAL (exact arithmetic;
       both engines round half away from zero on decimals — verified
       necessary: a >15-significant-digit decimal does NOT cast to
       double identically across engines, DuckDB's int128/10^scale
       conversion double-rounds),
    4. cast to double — now ≤14 significant digits, hence exact and
       identical. DuckDB mirror: :func:`osum`.
    """
    return F.round(F.sum(_c(col).cast(_DEC)), 4).cast("double")


def osum(expr: str) -> str:
    """DuckDB SQL mirror of :func:`dsum`."""
    return f"CAST(round(sum(CAST({expr} AS {_ODEC})), 4) AS DOUBLE)"


def davg(col: Column | str) -> Column:
    """Deterministic cross-engine average: exact-sum ÷ count.

    Both engines compute the same numerator double and the same
    bigint count; one IEEE division yields bit-identical results.
    Never use ``round(avg(x))`` — see THE FLOAT RULE above.
    """
    return dsum(col) / F.count(_c(col))


def oavg(expr: str) -> str:
    """DuckDB SQL mirror of :func:`davg`."""
    return f"({osum(expr)} / count({expr}))"


def net_price() -> Column:
    """The TPC-H discounted price expression (≤4 true dp)."""
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def py_round_half_away(x, dp: int):
    """Python-side half-AWAY-from-zero rounding (what DuckDB's round
    does). Python/numpy ``round`` are half-to-even and diverge from
    the oracle on exact .5 boundaries; every Python-computed contract
    value (pandas UDFs, stateful processors) must round this way.
    Accepts scalars or numpy/pandas arrays."""
    import numpy as np

    s = 10.0**dp
    return np.copysign(np.floor(np.abs(x) * s + 0.5), x) / s
