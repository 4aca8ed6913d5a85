"""Streaming realized volatility == batch realized volatility on the
same rows, replayed as ordered micro-batches."""

from __future__ import annotations

import glob
import os
import time as _time
from datetime import datetime, timezone

from pyspark.sql import types as T

RET_SCHEMA = T.StructType([
    T.StructField("key", T.StringType()),
    T.StructField("time", T.TimestampType()),
    T.StructField("value", T.DoubleType()),
])


def test_streaming_vol_matches_batch(spark, tmp_path):
    from data_timeseries_java_spark.operators.resample import (
        realized_volatility)
    from data_timeseries_java_spark.streaming.vol_stream import (
        streaming_realized_volatility)

    d = str(tmp_path)
    t = lambda h, m: datetime(2024, 8, 3, h, m, tzinfo=timezone.utc)
    rows = sorted(
        [("A", t(h, m), 0.01 * ((h * 7 + m) % 5 - 2))
         for h in range(4) for m in (0, 20, 40)] +
        [("B", t(h, m), 0.02 * ((h * 3 + m) % 7 - 3))
         for h in range(4) for m in (10, 30, 50)],
        key=lambda r: r[1])  # replay in event-time order: watermark
    # advances monotonically, so no row is (correctly) dropped as late
    base = _time.time() - 1000
    # 3 ordered batches (state must aggregate across micro-batches) plus
    # a sentinel flush batch: append mode only emits a window once the
    # watermark passes its end, so the final hour needs a later event to
    # push the watermark past it (the sentinel's own window stays open
    # and unemitted — asserted below)
    sentinel = [("A", t(5, 0), 0.0)]
    chunks = [rows[:8], rows[8:16], rows[16:], sentinel]
    for i, chunk in enumerate(chunks):
        spark.createDataFrame(chunk, RET_SCHEMA).coalesce(1).write.mode(
            "overwrite").parquet(f"{d}/f{i}")
        for p in glob.glob(f"{d}/f{i}/*"):
            os.utime(p, (base + i * 10, base + i * 10))

    src = (spark.readStream.schema(RET_SCHEMA)
           .option("maxFilesPerTrigger", 1).parquet(f"{d}/f*"))
    out = streaming_realized_volatility(src, "1 hour")
    q = (out.writeStream.format("memory").queryName("vol_stream")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = {(r.key, r.window_start, r.n_rets): round(r.realized_vol, 12)
           for r in spark.table("vol_stream").collect()}
    want = {(r.key, r.window_start, r.n_rets): round(r.realized_vol, 12)
            for r in realized_volatility(
                spark.createDataFrame(rows, RET_SCHEMA), "1 hour").collect()}
    assert got == want
    assert len(want) == 8  # 2 keys x 4 hourly windows
    # the sentinel's window (hour 5) is still open — correctly withheld
    assert all(ws.hour < 4 for _, ws, _ in got)
