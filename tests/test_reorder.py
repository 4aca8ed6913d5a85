"""Reorder-stage adoption for the remaining fold families: tick bars
and SCD2 must produce batch-identical results when rows interleave out
of order ACROSS micro-batches within the watermark delay. (The EMA
instance is pinned by the `ema_ooo_stream_replay` driver gate plus
tests/test_streaming_ema.py; these cover the other two inner folds
through the same shared stage.)"""

from __future__ import annotations

import glob
import os
import time as _time
from datetime import datetime, timezone


def _write_batches(spark, d, schema, batches):
    base = _time.time() - 1000
    for i, chunk in enumerate(batches):
        spark.createDataFrame(chunk, schema).coalesce(1).write.mode(
            "overwrite").parquet(f"{d}/f{i}")
        for p in glob.glob(f"{d}/f{i}/*"):
            os.utime(p, (base + i * 10, base + i * 10))


def _run(out, name):
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)


def test_reordered_tick_bars_cross_batch_out_of_order(spark, tmp_path):
    """Minutes 0..9 at bar_size 4; minutes 2 and 5 arrive one batch
    late (within D = 3 min). Completed bars must equal the in-order
    fold's: bar 0 = minutes 0-3, bar 1 = minutes 4-7; the far-future
    flusher tick lands in the open partial bar and completes nothing."""
    from data_timeseries_java_spark.streaming.reorder import (
        reordered_tick_bars,
    )

    t = lambda m: datetime(2024, 8, 4, 0, m, tzinfo=timezone.utc)
    px = {m: float(100 + m) for m in range(10)}
    schema = "key string, event_time timestamp, ask double"
    batches = [
        [("K", t(0), px[0]), ("K", t(1), px[1]), ("K", t(3), px[3])],
        [("K", t(2), px[2]), ("K", t(4), px[4]), ("K", t(6), px[6])],
        [("K", t(5), px[5]), ("K", t(7), px[7]), ("K", t(8), px[8]),
         ("K", t(9), px[9])],
        [("K", datetime(2024, 8, 4, 2, 0, tzinfo=timezone.utc), 0.0)],
    ]
    d = str(tmp_path)
    _write_batches(spark, d, schema, batches)
    src = (spark.readStream.schema(schema)
           .option("maxFilesPerTrigger", 1).parquet(f"{d}/f*"))
    _run(reordered_tick_bars(src, bar_size=4, watermark="3 minutes"),
         "reord_bars")
    rows = {r.bar: r for r in spark.table("reord_bars").collect()}
    assert set(rows) == {0, 1}
    b0, b1 = rows[0], rows[1]
    assert (b0.open, b0.high, b0.low, b0.close) == (
        px[0], px[3], px[0], px[3])
    assert b0.n_ticks == 4 and b1.n_ticks == 4
    assert (b1.open, b1.high, b1.low, b1.close) == (
        px[4], px[7], px[4], px[7])
    # time stamps follow event order, not arrival order
    ms = lambda m: int(t(m).timestamp() * 1000)
    assert (b0.t_open_ms, b0.t_close_ms) == (ms(0), ms(3))
    assert (b1.t_open_ms, b1.t_close_ms) == (ms(4), ms(7))


def test_reordered_scd2_cross_batch_out_of_order(spark, tmp_path):
    """A user's change log with the middle change delivered one batch
    late: closed versions must split at the true event-time boundaries
    (the unbuffered fold would fabricate an extra A->B->A->B zigzag).
    The far-future flusher row advances the watermark past every real
    row (sealing them into the fold) but itself stays inside D of the
    final watermark, so it never folds — the last real version stays
    OPEN in state, the same completed-units-only contract as the plain
    scd2 stream."""
    from data_timeseries_java_spark.streaming.reorder import (
        reordered_scd2,
    )

    t = lambda m: datetime(2024, 8, 5, 0, m, tzinfo=timezone.utc)
    schema = "user_id long, ts timestamp, event_id long, event_type string"
    flush_ts = datetime(2024, 8, 5, 2, 0, tzinfo=timezone.utc)
    batches = [
        [(1, t(0), 10, "A"), (1, t(4), 14, "B")],
        [(1, t(2), 12, "B"), (1, t(6), 16, "A")],  # t(2) one batch late
        [(1, flush_ts, 99, "Z")],
    ]
    d = str(tmp_path)
    _write_batches(spark, d, schema, batches)
    src = (spark.readStream.schema(schema)
           .option("maxFilesPerTrigger", 1).parquet(f"{d}/f*"))
    _run(reordered_scd2(src, watermark="3 minutes"), "reord_scd2")
    got = sorted(
        ((r.version, r.attr, r.valid_from_ms, r.valid_to_ms)
         for r in spark.table("reord_scd2").collect()))
    ms = lambda dt: int(dt.timestamp() * 1000)
    # true event order: A@0, B@2 (late), B@4 (no change), A@6;
    # A@6 opens version 3, which stays open (the flusher never folds)
    want = [
        (1, "A", ms(t(0)), ms(t(2)) - 1),
        (2, "B", ms(t(2)), ms(t(6)) - 1),
    ]
    assert got == want
