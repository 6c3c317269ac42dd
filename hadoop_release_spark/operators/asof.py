"""As-of join — nearest-prior-event join, a primitive Spark lacks.

Semantics: for each left row, find the single right row with the
same key and the greatest right time ≤ left time (DuckDB ``ASOF
JOIN``; pandas ``merge_asof`` direction='backward').

Implementation is the union-tag + running ``last(ignorenulls)``
window composition (SURVEY.md §2 c12): union both sides, sort within
each key by (time, side) and carry the latest non-null right payload
forward. Cost: ONE shuffle on the key + a sort — the same cost class
as a sort-merge join, with no per-key fanout, so it scales to
arbitrarily many rows per key (unlike a naive range join, which is
quadratic per key). An alternative (documented, not used here) is
``pyspark.pandas.merge_asof``, which plans a similar union-window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    time: str,
    payload: list[str],
    how: str = "inner",
) -> DataFrame:
    """As-of join two frames that share `key` and `time` column names.

    ``right`` must be unique per (key, time) — pre-aggregate it
    otherwise, or the match is nondeterministic. ``payload`` are the
    right-side value columns carried onto matching left rows; all
    other column names must be disjoint between the two inputs.
    """
    l_tagged = left.withColumn(_SIDE, F.lit(1))
    r_tagged = right.withColumn(_SIDE, F.lit(0))
    # Right rows sort before left rows at equal time, so a right row
    # at exactly t is visible to a left row at t (ASOF >= semantics).
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        .orderBy(time, _SIDE)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for col in payload:
        unioned = unioned.withColumn(col, F.last(col, ignorenulls=True).over(w))
    out = unioned.filter(F.col(_SIDE) == 1).drop(_SIDE)
    if how == "inner":
        out = out.filter(F.col(payload[0]).isNotNull())
    return out
