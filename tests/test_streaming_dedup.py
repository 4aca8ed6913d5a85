"""Streaming dedup: duplicates across micro-batches are suppressed."""

from __future__ import annotations

import glob
import os
import time as _time
from datetime import datetime, timezone

from data_timeseries_java_spark.streaming.dedup_stream import (
    streaming_dedup_content,
)

SCHEMA = "doc_id long, ts timestamp, text string"


def test_streaming_content_dedup_across_batches(spark, tmp_path):
    d = str(tmp_path)
    t = lambda m: datetime(2024, 5, 1, 0, m, tzinfo=timezone.utc)
    f0 = [(1, t(0), "alpha beta"), (2, t(1), "gamma delta")]
    f1 = [(3, t(2), "ALPHA beta"),   # duplicate content (case-folded)
          (4, t(3), "epsilon zeta")]
    f2 = [(5, t(4), "gamma delta"),  # duplicate of doc 2
          (6, t(5), "eta theta")]
    base = _time.time() - 1000
    for i, rows in enumerate([f0, f1, f2]):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "overwrite").parquet(f"{d}/f{i}")
        for p in glob.glob(f"{d}/f{i}/*"):
            os.utime(p, (base + i * 10, base + i * 10))

    src = (spark.readStream.schema(SCHEMA)
           .option("maxFilesPerTrigger", 1).parquet(f"{d}/f*"))
    out = streaming_dedup_content(src, watermark="1 hour")
    q = (out.writeStream.format("memory").queryName("dedup_stream")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)

    rows = spark.table("dedup_stream").collect()
    ids = sorted(r.doc_id for r in rows)
    # docs 3 (dup of 1, case-insensitive) and 5 (dup of 2) suppressed
    assert ids == [1, 2, 4, 6]


def test_streaming_exact_dedup_identity_within_horizon(spark, tmp_path):
    """A later duplicate of the same identity with a DIFFERENT timestamp
    is still suppressed (dropDuplicatesWithinWatermark semantics — plain
    dropDuplicates(id+ts) would let it through)."""
    from data_timeseries_java_spark.streaming.dedup_stream import (
        streaming_dedup_exact,
    )

    d = str(tmp_path)
    t = lambda m: datetime(2024, 5, 1, 0, m, tzinfo=timezone.utc)
    f0 = [(1, t(0), "a"), (2, t(1), "b")]
    f1 = [(1, t(5), "a-replay"),   # same id, later ts → dropped
          (3, t(6), "c")]
    base = _time.time() - 1000
    for i, rows in enumerate([f0, f1]):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "overwrite").parquet(f"{d}/g{i}")
        for p in glob.glob(f"{d}/g{i}/*"):
            os.utime(p, (base + i * 10, base + i * 10))

    src = (spark.readStream.schema(SCHEMA)
           .option("maxFilesPerTrigger", 1).parquet(f"{d}/g*"))
    out = streaming_dedup_exact(src, ["doc_id"], watermark="1 hour")
    q = (out.writeStream.format("memory").queryName("dedup_exact_stream")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)

    ids = sorted(r.doc_id for r in spark.table("dedup_exact_stream").collect())
    assert ids == [1, 2, 3]
