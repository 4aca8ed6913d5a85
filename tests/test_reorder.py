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


def _ms(dt):
    return int(dt.timestamp() * 1000)


def test_reordered_series_matches_inorder_recursion(spark, tmp_path):
    """Every ema_stream-family spec behind the reorder stage: minute 2
    of a 6-minute series arrives one batch late (within D = 3 min);
    the emitted series must equal the spec's recursion folded in TRUE
    event-time order (computed directly from the shared spec objects —
    the exact doubles the plain in-order stream would produce)."""
    import pytest  # noqa: F401

    from data_timeseries_java_spark.streaming import reorder
    from data_timeseries_java_spark.streaming.ema_stream import (
        drawdown_spec,
        garch_spec,
        holt_spec,
        kalman_spec,
        macd_spec,
    )

    cases = {
        "holt": (holt_spec(), reorder.reordered_holt),
        "kalman": (kalman_spec(), reorder.reordered_kalman),
        "garch": (garch_spec(), reorder.reordered_garch),
        "drawdown": (drawdown_spec(), reorder.reordered_drawdown),
        "macd": (macd_spec(), reorder.reordered_macd),
    }
    t = lambda m: datetime(2024, 8, 6, 0, m, tzinfo=timezone.utc)
    prices = [5.0, 9.0, 7.0, 11.0, 8.0, 10.0]
    rows = [("K", t(m), p) for m, p in enumerate(prices)]
    schema = "key string, event_time timestamp, price double"
    flush = ("ZZZ", datetime(2024, 8, 6, 3, 0, tzinfo=timezone.utc), 0.0)
    batches = [
        [rows[0], rows[1], rows[3]],
        [rows[2], rows[4], rows[5]],   # minute 2 one batch late
        [flush],
    ]
    d = str(tmp_path)
    _write_batches(spark, d, schema, batches)

    for name, (spec, make) in cases.items():
        init, step, out_extra, _ = spec
        extra_names = [c.split()[0] for c in out_extra.split(", ")]
        st, want = None, []
        for z in prices:
            st, extras = (init(z) if st is None else step(st, z))
            want.append(extras)

        src = (spark.readStream.schema(schema)
               .option("maxFilesPerTrigger", 1).parquet(f"{d}/f*"))
        _run(make(src, watermark="3 minutes"), f"reord_{name}")
        got = sorted(
            ((r.key,) + tuple(r) for r in
             spark.table(f"reord_{name}").collect()
             if r.key == "K"),
            key=lambda x: x[2])
        assert len(got) == len(prices), name
        for i, row in enumerate(got):
            # row = (key, key, event_time, price, *extras)
            assert row[3] == prices[i], name
            for j, nm in enumerate(extra_names):
                assert row[4 + j] == want[i][j], (name, nm, i)


def test_reordered_anchored_vwap_cross_batch_out_of_order(spark, tmp_path):
    """Hour 1 of day 1 arrives one batch late: the anchored cumsum must
    still accumulate in event-time order (equal to vwap_fold run over
    the in-order arrays), and day 2 must reset the anchor."""
    import numpy as np

    from data_timeseries_java_spark.streaming.reorder import (
        reordered_anchored_vwap,
    )
    from data_timeseries_java_spark.streaming.vwap_stream import vwap_fold

    h = lambda d, hh: datetime(2024, 8, d, hh, 0, tzinfo=timezone.utc)
    rows = [  # (event_time, sum_price, volume)
        (h(7, 0), 100.0, 10), (h(7, 1), 50.5, 5), (h(7, 2), 30.0, 3),
        (h(8, 0), 70.0, 7), (h(8, 1), 20.0, 2),
    ]
    schema = ("key string, event_time timestamp, sum_price double, "
              "volume long")
    batches = [
        [("K",) + rows[0], ("K",) + rows[2]],
        [("K",) + rows[1], ("K",) + rows[3]],   # hour 1 one batch late
        [("K",) + rows[4],
         ("ZZZ", datetime(2024, 8, 20, 0, 0, tzinfo=timezone.utc),
          1.0, 1)],
    ]
    d = str(tmp_path)
    _write_batches(spark, d, schema, batches)
    src = (spark.readStream.schema(schema)
           .option("maxFilesPerTrigger", 1).parquet(f"{d}/f*"))
    _run(reordered_anchored_vwap(src, watermark="2 hours"), "reord_vwap")

    ts_ms = np.array([_ms(r[0]) for r in rows], dtype="int64")
    cols, _ = vwap_fold(ts_ms,
                        np.array([r[1] for r in rows]),
                        np.array([r[2] for r in rows], dtype="int64"),
                        (None, 0.0, 0))
    got = sorted(((r.anchor_ms, _ms(r.event_time), r.volume,
                   r.window_vwap, r.anchored_vwap)
                  for r in spark.table("reord_vwap").collect()
                  if r.key == "K"))
    want = sorted(zip(cols["anchor_ms"].tolist(), ts_ms.tolist(),
                      cols["volume"].tolist(),
                      cols["window_vwap"].tolist(),
                      cols["anchored_vwap"].tolist()))
    assert got == want
    # two distinct anchors (day rollover reset)
    assert len({a for a, *_ in got}) == 2


def test_reordered_funnel_cross_batch_out_of_order(spark, tmp_path):
    """The view arrives one batch AFTER the click: an unbuffered fold
    sees click-before-view and silently loses the conversion; behind
    the reorder stage the stage machine folds in true event-time order
    and the user converts fully."""
    from data_timeseries_java_spark.streaming.funnel_stream import (
        funnel_step,
    )
    from data_timeseries_java_spark.streaming.reorder import (
        reordered_funnel,
    )

    t = lambda m: datetime(2024, 8, 9, 0, m, tzinfo=timezone.utc)
    schema = "user_id long, ts timestamp, event_type string"
    batches = [
        [(1, t(2), "click")],
        [(1, t(0), "view"), (1, t(4), "purchase")],  # view one batch late
        [(999, datetime(2024, 8, 9, 3, 0, tzinfo=timezone.utc), "view")],
    ]
    d = str(tmp_path)
    _write_batches(spark, d, schema, batches)
    src = (spark.readStream.schema(schema)
           .option("maxFilesPerTrigger", 1).parquet(f"{d}/f*"))
    _run(reordered_funnel(src, watermark="3 minutes"), "reord_funnel")
    snaps = [r for r in spark.table("reord_funnel").collect()
             if r.user_id == 1]
    latest = max(snaps, key=lambda r: r.asof_ms)
    assert (latest.t_view, latest.t_click, latest.t_purchase) == (
        _ms(t(0)), _ms(t(2)), _ms(t(4)))
    # the arrival-order fold WOULD have lost it (regression witness)
    v, c, p = funnel_step(None, None, None,
                          [_ms(t(2)), _ms(t(0)), _ms(t(4))],
                          ["click", "view", "purchase"])
    assert c is None and p is None


def test_reordered_imbalance_bars_cross_batch_out_of_order(spark,
                                                           tmp_path):
    """Ticks displaced across batches: completed bars must equal
    imbalance_step folded in true event-time order (the recursion is
    order-sensitive through the tick-rule direction carry)."""
    from data_timeseries_java_spark.streaming.bars_stream import (
        imbalance_step,
    )
    from data_timeseries_java_spark.streaming.reorder import (
        reordered_imbalance_bars,
    )

    t = lambda m: datetime(2024, 8, 10, 0, m, tzinfo=timezone.utc)
    prices = [10.0, 11.0, 12.0, 11.0, 12.0, 13.0, 14.0, 13.0, 14.0,
              15.0]
    rows = [("K", t(m), p) for m, p in enumerate(prices)]
    schema = "key string, event_time timestamp, ask double"
    batches = [
        [rows[0], rows[1], rows[4], rows[5]],
        [rows[2], rows[3], rows[7]],       # displaced within D
        [rows[6], rows[8], rows[9]],
        [("ZZZ", datetime(2024, 8, 10, 4, 0, tzinfo=timezone.utc), 0.0)],
    ]
    d = str(tmp_path)
    _write_batches(spark, d, schema, batches)
    src = (spark.readStream.schema(schema)
           .option("maxFilesPerTrigger", 1).parquet(f"{d}/f*"))
    _run(reordered_imbalance_bars(src, threshold=3,
                                  watermark="5 minutes"), "reord_imb")

    want, _ = imbalance_step(
        "K", prices, [_ms(t(m)) for m in range(len(prices))],
        (0, 0, 0, 0, 0, 0.0, 0, float("nan"), 0), 3)
    got = sorted((tuple(r) for r in spark.table("reord_imb").collect()
                  if r.key == "K"), key=lambda x: x[1])
    assert [tuple(w) for w in want] == got
    assert len(got) > 0


def test_reorder_state_ttl_reseeds_cleanly(spark, tmp_path):
    """state_ttl: a key whose buffer drained and that stays quiet for
    the TTL (in watermark time) releases ALL state; its next row
    re-seeds the fold from scratch (EMA == the new price, not a
    continuation of the stale seed). The driver key 'W' keeps the
    watermark moving while 'K' is quiet."""
    from data_timeseries_java_spark.streaming.reorder import reordered_ema

    t0 = datetime(2024, 8, 11, 0, 0, tzinfo=timezone.utc)
    mins = lambda m: datetime(2024, 8, 11, m // 60, m % 60,
                              tzinfo=timezone.utc)
    schema = "key string, event_time timestamp, value double"
    batches = [
        [("K", t0, 100.0), ("W", mins(1), 1.0)],
        [("W", mins(10), 1.0)],    # wm -> 8 min: seals K@0 (ema 100)
        [("W", mins(40), 1.0)],    # wm -> 38 min after this batch
        # the watermark lags one batch, so K's TTL timeout (deadline =
        # 8 min flush + 20 min TTL = 28 min) fires during THIS empty
        # invocation, releasing K's state before any new K row arrives
        [("W", mins(45), 1.0)],
        [("K", mins(50), 50.0), ("W", mins(60), 1.0)],
        [("W", mins(90), 1.0)],    # wm -> 88 min: seals K@50
    ]
    d = str(tmp_path)
    _write_batches(spark, d, schema, batches)
    src = (spark.readStream.schema(schema)
           .option("maxFilesPerTrigger", 1).parquet(f"{d}/f*"))
    _run(reordered_ema(src, alpha=0.2, watermark="2 minutes",
                       state_ttl="20 minutes"), "reord_ttl")
    got = {(_ms(r.event_time)): r.ema
           for r in spark.table("reord_ttl").collect() if r.key == "K"}
    assert got == {_ms(t0): 100.0, _ms(mins(50)): 50.0}

    # control: WITHOUT the TTL the seed survives the quiet gap and the
    # second row continues the recursion instead of re-seeding
    _run(reordered_ema(
        (spark.readStream.schema(schema)
         .option("maxFilesPerTrigger", 1).parquet(f"{d}/f*")),
        alpha=0.2, watermark="2 minutes"), "reord_nottl")
    got2 = {(_ms(r.event_time)): r.ema
            for r in spark.table("reord_nottl").collect()
            if r.key == "K"}
    assert got2[_ms(mins(50))] == 0.2 * 50.0 + 0.8 * 100.0


def test_reorder_buffer_cap_spill_inorder_identical(spark, tmp_path):
    """max_buffer_rows guard, spill policy (round-12 VERDICT #5): a hot
    key whose single batch exceeds the cap gets the oldest overflow
    sealed EARLY through the fold in event-time order — for in-order
    arrival the emitted EMA series must be byte-identical to the
    unguarded in-order recursion (early sealing changes WHEN rows
    fold, never the fold order)."""
    import pandas as pd

    from data_timeseries_java_spark.streaming.reorder import reordered_ema

    t = lambda m: datetime(2024, 8, 4, 0, m, tzinfo=timezone.utc)
    prices = [100.0 + i for i in range(20)]
    schema = "key string, event_time timestamp, ask double"
    batches = [
        # one hot batch: 20 rows for one key, far above the cap of 5
        [("H", t(m), prices[m]) for m in range(20)],
        # far-future flusher seals the surviving buffer
        [("H", datetime(2024, 8, 4, 6, 0, tzinfo=timezone.utc), 0.0)],
    ]
    d = str(tmp_path)
    _write_batches(spark, d, schema, batches)
    src = (spark.readStream.schema(schema)
           .option("maxFilesPerTrigger", 1).parquet(f"{d}/f*"))
    _run(reordered_ema(src, alpha=0.2, price_col="ask",
                       watermark="3 minutes", max_buffer_rows=5),
         "reord_cap_spill")
    got = {(_ms(r.event_time.replace(tzinfo=timezone.utc))): r.ema
           for r in spark.table("reord_cap_spill").collect()}
    expected = pd.Series(prices).ewm(alpha=0.2, adjust=False).mean()
    assert set(got) == {_ms(t(m)) for m in range(20)}
    for m in range(20):
        assert got[_ms(t(m))] == expected.iloc[m], f"minute {m}"


def test_reorder_buffer_cap_spill_shrinks_tolerance(spark, tmp_path):
    """The documented semantic cost of a spill: the drop front advances
    to the newest spilled timestamp, so a late row OLDER than the
    spilled front is dropped (the standing drop contract), while a
    late row inside the surviving buffer still folds in event-time
    order."""
    import pandas as pd

    from data_timeseries_java_spark.streaming.reorder import reordered_ema

    t = lambda m: datetime(2024, 8, 4, 0, m, tzinfo=timezone.utc)
    px = {m: 100.0 + m for m in range(12)}
    schema = "key string, event_time timestamp, ask double"
    batches = [
        # 10 rows, cap 4 -> minutes 0-5 spill, drop front = minute 5;
        # minutes 6-9 survive in the buffer. Skip minute 8 so a late
        # in-tolerance row exists.
        [("H", t(m), px[m]) for m in (0, 1, 2, 3, 4, 5, 6, 7, 9)]
        + [("H", t(10), px[10])],
        # minute 3 is OLDER than the spilled front -> dropped;
        # minute 8 is within the surviving buffer -> folds in order
        [("H", t(3), px[3]), ("H", t(8), px[8])],
        [("H", datetime(2024, 8, 4, 6, 0, tzinfo=timezone.utc), 0.0)],
    ]
    d = str(tmp_path)
    _write_batches(spark, d, schema, batches)
    src = (spark.readStream.schema(schema)
           .option("maxFilesPerTrigger", 1).parquet(f"{d}/f*"))
    _run(reordered_ema(src, alpha=0.2, price_col="ask",
                       watermark="3 minutes", max_buffer_rows=4),
         "reord_cap_drop")
    rows = spark.table("reord_cap_drop").collect()
    got = {(_ms(r.event_time.replace(tzinfo=timezone.utc))): r.ema
           for r in rows}
    # minute 3's replay is dropped: exactly one output row per minute,
    # none for the duplicate, and the fold sequence is the in-order
    # recursion over the rows that were ACCEPTED (0-10 incl. late 8)
    folded = [px[m] for m in range(11)]
    expected = pd.Series(folded).ewm(alpha=0.2, adjust=False).mean()
    assert set(got) == {_ms(t(m)) for m in range(11)}
    assert len(rows) == 11
    for i, m in enumerate(range(11)):
        assert got[_ms(t(m))] == expected.iloc[i], f"minute {m}"


def test_reorder_buffer_cap_error_policy(spark, tmp_path):
    """on_overflow='error' must fail the query loudly with the key and
    buffer size — the audit posture where a hot key means upstream
    misconfiguration."""
    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from data_timeseries_java_spark.streaming.reorder import reordered_ema

    t = lambda m: datetime(2024, 8, 4, 0, m, tzinfo=timezone.utc)
    schema = "key string, event_time timestamp, ask double"
    batches = [[("H", t(m), 100.0 + m) for m in range(20)]]
    d = str(tmp_path)
    _write_batches(spark, d, schema, batches)
    src = (spark.readStream.schema(schema)
           .option("maxFilesPerTrigger", 1).parquet(f"{d}/f*"))
    out = reordered_ema(src, alpha=0.2, price_col="ask",
                        watermark="3 minutes", max_buffer_rows=5,
                        on_overflow="error")
    q = (out.writeStream.format("memory").queryName("reord_cap_err")
         .outputMode("append").trigger(availableNow=True).start())
    with pytest.raises(StreamingQueryException,
                       match="reorder buffer overflow"):
        q.awaitTermination(180)

    with pytest.raises(ValueError, match="on_overflow"):
        reordered_ema(src, max_buffer_rows=5, on_overflow="bogus")
