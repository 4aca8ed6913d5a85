"""Streaming deduplication: drop duplicate records across micro-batches.

The streaming face of the dedup family (operators/dedup.py): exact-ID
dedup via Spark's watermarked ``dropDuplicates`` state store — duplicates
arriving within the watermark horizon are suppressed; state for old keys
is evicted once the watermark passes, which bounds memory at 100 TB
(unbounded dedup state is the classic streaming-pipeline OOM).

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
    horizon; later duplicates (within the horizon) are dropped."""
    return (events
            .withWatermark(time_col, watermark)
            .dropDuplicates(id_cols + [time_col]))


def streaming_dedup_content(docs: DataFrame,
                            text_col: str = "text",
                            time_col: str = "ts",
                            watermark: str = "10 minutes") -> DataFrame:
    """Content dedup: normalize + hash the payload, dedup on the hash."""
    hashed = docs.withColumn("_content_hash",
                             F.md5(F.lower(F.col(text_col))))
    return (hashed
            .withWatermark(time_col, watermark)
            .dropDuplicates(["_content_hash"])
            .drop("_content_hash"))
