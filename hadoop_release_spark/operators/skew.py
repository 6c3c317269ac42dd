"""Skew-mitigation operators: salting for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most skew
at runtime by splitting oversized partitions. Salting is the
explicit, planner-independent fallback for the pathological cases
AQE can't fix — a hot GROUP BY key (AQE cannot split one group's
state) or a hot join key against a non-broadcastable build side.

Two-phase salted aggregation: append salt = pmod(hash(unique col), S)
→ aggregate on (key, salt) — the hot key's rows spread across S
reducers — → aggregate the S partials per key. Algebra must be
decomposable (sum/count/min/max; avg = sum÷count at the outer level).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_sum_count(
    df: DataFrame,
    key: str,
    value: Column | str,
    salt_col: str,
    buckets: int = 16,
) -> DataFrame:
    """Skew-safe sum+count per `key`.

    ``salt_col`` is any column with per-row variation (a unique id is
    ideal); the salt derives from its hash, so the result is
    deterministic — no randomness, same answer at any bucket count.
    Returns (key, sum_value, n).
    """
    v = F.col(value) if isinstance(value, str) else value
    salted = df.withColumn(_SALT, F.pmod(F.xxhash64(F.col(salt_col)), F.lit(buckets)))
    partial = salted.groupBy(key, _SALT).agg(
        F.sum(v.cast("decimal(25,8)")).alias("__psum"),
        F.count(F.lit(1)).alias("__pn"),
    )
    return partial.groupBy(key).agg(
        F.round(F.sum("__psum"), 4).cast("double").alias("sum_value"),
        F.sum("__pn").alias("n"),
    )
