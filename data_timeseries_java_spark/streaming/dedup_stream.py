"""Streaming deduplication: drop duplicate records across micro-batches.

The streaming face of the dedup family (operators/dedup.py), built on
``dropDuplicatesWithinWatermark`` (Spark 3.5+): duplicates arriving
within the watermark horizon of the first arrival are suppressed, and —
unlike plain ``dropDuplicates`` on non-event-time keys — the state store
entry is EVICTED once the watermark passes the first arrival's event
time, which bounds state at 100 TB (unbounded dedup state is the classic
streaming-pipeline OOM). Plain ``dropDuplicates`` only evicts when the
event-time column is part of the key subset, which would change the
semantics to "exact (identity, timestamp) replays only".

Content-hash dedup composes the same way: hash the payload into the
dedup key column (`F.md5`) and drop on (hash) instead of (id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_dedup_exact(events: DataFrame,
                          id_cols: list[str],
                          time_col: str = "ts",
                          watermark: str = "10 minutes") -> DataFrame:
    """Keep the first arrival of each identity within the watermark
    horizon; later duplicates of the SAME identity — even with different
    timestamps — are dropped while the identity's state lives. State is
    evicted when the watermark passes the first arrival."""
    return (events
            .withWatermark(time_col, watermark)
            .dropDuplicatesWithinWatermark(id_cols))


def streaming_dedup_content(docs: DataFrame,
                            text_col: str = "text",
                            time_col: str = "ts",
                            watermark: str = "10 minutes") -> DataFrame:
    """Content dedup: normalize + hash the payload, dedup on the hash.
    Hash state is evicted at the watermark horizon (bounded memory)."""
    hashed = docs.withColumn("_content_hash",
                             F.md5(F.lower(F.col(text_col))))
    return (hashed
            .withWatermark(time_col, watermark)
            .dropDuplicatesWithinWatermark(["_content_hash"])
            .drop("_content_hash"))
