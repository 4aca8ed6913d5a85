"""Batch MERGE (upsert): last-writer-wins key merge as one anti-join +
union — the plain-parquet equivalent of Delta/Iceberg ``MERGE INTO``
(on an ACID table format the same frame pair feeds the real MERGE; the
reference has no mutation story at all, its sink is a logger).

Scale shape: the anti-join shuffles both sides on the key once (or not
at all when target and updates are key-bucketed co-located tables); the
union is free. No driver participation, no row-by-row lookups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, updates: DataFrame,
                 key_cols: list[str]) -> DataFrame:
    """Rows in ``updates`` replace target rows with the same key; keys
    absent from the target are inserted. Column sets must match."""
    kept = target.join(updates.select(*key_cols).distinct(),
                       key_cols, "left_anti")
    return kept.unionByName(updates)
