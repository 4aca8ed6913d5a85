"""Event-driven bars & liquidity tier: structural invariants the DuckDB
oracle cannot express (bar-size exactness, conservation-of-volume,
POC uniqueness, channel ordering)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from data_timeseries_java_spark.operators.bars import (
    amihud_illiquidity,
    anchored_vwap,
    donchian_channels,
    tick_bars,
    volume_profile,
    vpin,
)
from data_timeseries_java_spark.operators.candles import candles_pipeline
from data_timeseries_java_spark.tables import events_as_ticks


@pytest.fixture(scope="module")
def ticks(spark, sf_dir):
    return events_as_ticks(spark, sf_dir).cache()


def test_tick_bars_exact_size_except_last(spark, ticks):
    bars = tick_bars(ticks, bar_size=50).collect()
    n_ticks_total = ticks.count()
    assert sum(b.n_ticks for b in bars) == n_ticks_total  # conservation
    last_bar = {}
    for b in bars:
        last_bar[b.key] = max(last_bar.get(b.key, -1), b.bar)
    for b in bars:
        if b.bar < last_bar[b.key]:
            assert b.n_ticks == 50, (b.key, b.bar, b.n_ticks)
        assert b.low <= b.open <= b.high
        assert b.low <= b.close <= b.high
        assert b.t_open_ms <= b.t_close_ms


def test_tick_bars_time_monotone_within_key(spark, ticks):
    """Bar time ranges must not overlap: bar i closes before bar i+1
    opens (ties impossible — (key, ts) unique)."""
    bars = sorted(tick_bars(ticks, bar_size=50).collect(),
                  key=lambda b: (b.key, b.bar))
    for a, b in zip(bars, bars[1:]):
        if a.key == b.key:
            assert a.t_close_ms < b.t_open_ms


def test_vwap_within_price_extent(spark, ticks):
    out = anchored_vwap(ticks, "1 hour").collect()
    ext = {r.key: (r.lo, r.hi) for r in
           ticks.groupBy("key").agg(F.min("ask").alias("lo"),
                                    F.max("ask").alias("hi")).collect()}
    for r in out:
        lo, hi = ext[r.key]
        assert lo - 1e-6 <= r.window_vwap <= hi + 1e-6
        assert lo - 1e-6 <= r.anchored_vwap <= hi + 1e-6


def test_vwap_anchor_resets_each_day(spark, ticks):
    """The first window of each (key, day) anchor must have
    anchored_vwap == its own window_vwap (no carry across days)."""
    rows = sorted(anchored_vwap(ticks, "1 hour").collect(),
                  key=lambda r: (r.key, r.w_start_ms))
    seen = set()
    firsts = 0
    for r in rows:
        if (r.key, r.anchor_ms) not in seen:
            seen.add((r.key, r.anchor_ms))
            assert math.isclose(r.anchored_vwap, r.window_vwap,
                                rel_tol=1e-9)
            firsts += 1
    assert firsts >= 2  # multiple anchors actually exercised


def test_vpin_bounds_and_bucket_sizes(spark, ticks):
    rows = vpin(ticks, bucket_size=50, n_buckets=5).collect()
    for r in rows:
        assert 0.0 <= r.imbalance <= 1.0
        assert 0.0 <= r.vpin <= 1.0
        assert r.n_buy + r.n_sell <= r.n_ticks


def test_amihud_nonnegative_and_first_window_null(spark, ticks):
    rows = sorted(amihud_illiquidity(ticks, "1 hour").collect(),
                  key=lambda r: (r.key, r.w_start_ms))
    first_per_key = set()
    for r in rows:
        if r.key not in first_per_key:
            first_per_key.add(r.key)
            assert r.illiq is None  # no base for the first live window
        if r.illiq is not None:
            assert r.illiq >= 0.0


def test_volume_profile_conserves_and_unique_poc(spark, ticks):
    prof = volume_profile(ticks, n_bins=20).collect()
    total = sum(r.volume for r in prof)
    assert total == ticks.count()
    by_key = {}
    for r in prof:
        assert 0 <= r.bin < 20
        assert r.bin_low <= r.bin_high
        by_key.setdefault(r.key, []).append(r)
    for key, rows in by_key.items():
        pocs = [r for r in rows if r.is_poc]
        assert len(pocs) == 1, key
        assert pocs[0].volume == max(r.volume for r in rows)


def test_donchian_channel_ordering(spark, ticks, sf_dir):
    keys = ticks.select("key").distinct()
    d = donchian_channels(candles_pipeline(ticks, keys, "1 hour"),
                          n_windows=6).collect()
    for r in d:
        if r.channel_high is not None:
            assert r.channel_low <= r.channel_mid <= r.channel_high
            if r.breakout_up:
                assert r.close_price > r.channel_high
            if r.breakout_down:
                assert r.close_price < r.channel_low


def test_dollar_bars_value_threshold_and_conservation(spark, ticks):
    from data_timeseries_java_spark.operators.bars import dollar_bars

    T = 5_000.0
    bars = dollar_bars(ticks, threshold=T).collect()
    assert sum(b.n_ticks for b in bars) == ticks.count()
    last_bar = {}
    for b in bars:
        last_bar[b.key] = max(last_bar.get(b.key, -1), b.bar)
        assert b.low <= b.open <= b.high
        assert b.low <= b.close <= b.high
    for b in bars:
        if b.bar < last_bar[b.key]:
            # a completed bar's value reaches the threshold with its
            # last tick but not without it (bar_value - close < T)
            assert b.bar_value >= T - 1e-6 or b.bar_value - b.close < T
            # and never overshoots by more than one tick's price
            assert b.bar_value - b.close < T + 1e-6


def test_imbalance_bars_threshold_and_conservation(spark, ticks):
    from data_timeseries_java_spark.operators.bars import imbalance_bars

    thr = 7
    bars = imbalance_bars(ticks, threshold=thr).collect()
    assert sum(b.n_ticks for b in bars) == ticks.count()
    last_bar = {}
    for b in bars:
        last_bar[b.key] = max(last_bar.get(b.key, -1), b.bar)
        assert b.n_buy + b.n_sell <= b.n_ticks
        assert b.n_buy - b.n_sell == b.imbalance
    for b in bars:
        if b.bar < last_bar[b.key]:
            assert abs(b.imbalance) == thr  # closes EXACTLY at the hit
        else:
            assert abs(b.imbalance) <= thr


def test_imbalance_bars_sequential_non_overlap(spark, ticks):
    from data_timeseries_java_spark.operators.bars import imbalance_bars

    bars = sorted(imbalance_bars(ticks).collect(),
                  key=lambda b: (b.key, b.bar))
    for a, b in zip(bars, bars[1:]):
        if a.key == b.key:
            assert b.bar == a.bar + 1
            assert a.t_close_ms < b.t_open_ms


def test_imbalance_bars_invariant_to_arrow_batch_size(spark, ticks):
    """The bounded-memory claim's correctness half: the mapInPandas
    fold carries (bar id, in-flight counters, open state, tick-rule
    direction) across Arrow batch boundaries, so the result must be
    IDENTICAL whether a key's history arrives as one batch or as many
    64-row slivers (batch boundaries then fall mid-bar and mid-key
    constantly — any state-carry bug shows immediately)."""
    from data_timeseries_java_spark.operators.bars import imbalance_bars

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    baseline = sorted(map(tuple, imbalance_bars(ticks, 7).collect()))
    try:
        spark.conf.set(key, "64")
        slivers = sorted(map(tuple, imbalance_bars(ticks, 7).collect()))
    finally:
        spark.conf.set(key, old)
    assert baseline == slivers
    assert len(baseline) > 0


def test_imbalance_fold_tolerates_empty_arrow_chunks():
    """Arrow may legally yield a ZERO-ROW frame anywhere in the
    mapInPandas iterator; the lattice fold's segment scan assumes >=1
    row (ks[lo] on an empty slice raised IndexError before the guard).
    Drive the captured fold directly with empty chunks leading, mid-
    stream, and trailing, and assert the result equals the no-empties
    run (state must cross an empty chunk untouched)."""
    import numpy as np
    import pandas as pd

    from data_timeseries_java_spark.operators.bars import (
        make_imbalance_fold,
    )

    def mk(keys, px, ts):
        return pd.DataFrame({
            "key": keys,
            "ask": np.asarray(px, dtype="float64"),
            "event_time": pd.to_datetime(
                np.asarray(ts, dtype="int64") * 1_000_000)})

    empty = mk([], [], [])
    a = mk(["A"] * 4, [1, 2, 3, 4], [1, 2, 3, 4])
    b = mk(["A"] * 3 + ["B"] * 2, [5, 6, 7, 10, 11], [5, 6, 7, 1, 2])

    def run(chunks):
        out = list(make_imbalance_fold(3)(iter(chunks)))
        return (pd.concat(out, ignore_index=True)
                .sort_values(["key", "bar"]).reset_index(drop=True)
                if out else pd.DataFrame())

    base = run([a, b])
    with_empties = run([empty, a, empty, empty, b, empty])
    pd.testing.assert_frame_equal(base, with_empties)
    assert len(base) > 0
    assert run([empty]).empty and run([]).empty
