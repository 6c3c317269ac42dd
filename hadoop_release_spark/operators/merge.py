"""MERGE / upsert emulation (CDC apply) without a table format.

Delta/Iceberg/Hudi jars are not in this image, so MERGE INTO is
emulated with the classic anti-join + union rewrite:

    result = (target ANTI JOIN updates ON key)  ∪  updates'

which is exactly what a copy-on-write table format executes
underneath. Deletes are rows flagged in the change feed; the same
rewrite drops them by filtering the change side.

Scale: one shuffle of each side on the key (or zero for a
bucketed-by-key target, the c15 ingest pattern); at 100 TB a real
deployment partitions the target so only partitions containing
changed keys rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    changes: DataFrame,
    key: str,
    delete_flag: str | None = None,
) -> DataFrame:
    """Apply a change feed to a target table.

    ``changes`` rows replace target rows with the same ``key``
    (upsert); if ``delete_flag`` names a boolean column in changes,
    rows with it true delete the key instead. ``changes`` must be
    unique per key (dedupe upstream — e.g. last-writer-wins via a
    row_number window over a version column).
    """
    untouched = target.join(changes.select(key), on=key, how="left_anti")
    if delete_flag is not None:
        incoming = changes.filter(~F.col(delete_flag)).drop(delete_flag)
    else:
        incoming = changes
    return untouched.unionByName(incoming.select(*target.columns))
