"""Resampling tier: rollup composition identity and TWAP invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_timeseries_java_spark.operators import ohlc_candles
from data_timeseries_java_spark.operators.resample import rollup_candles, twap
from data_timeseries_java_spark.tables import events_as_ticks


@pytest.fixture(scope="module")
def ticks(spark, sf_dir):
    return events_as_ticks(spark, sf_dir).cache()


def test_rollup_equals_direct_aggregation(spark, ticks):
    """OHLC composes: rolling 1h live candles to 4h must equal
    aggregating the ticks directly at 4h."""
    direct = ohlc_candles(ticks, "4 hours")
    rolled = rollup_candles(ohlc_candles(ticks, "1 hour"), "4 hours")

    def flat(df):
        return {(r.key, r.window_start): (r.close.ask, r.min_ask.ask,
                                          r.max_ask.ask, r.close.time)
                for r in df.collect()}

    assert flat(direct) == flat(rolled)


def test_twap_bounds_and_single_tick(spark, ticks):
    out = twap(ticks, "1 hour").collect()
    assert out
    # TWAP lies within [min, max] of the window's prices
    mm = {(r.key, r.window_start): (r.min_ask.ask, r.max_ask.ask)
          for r in ohlc_candles(ticks, "1 hour").collect()}
    for r in out:
        lo, hi = mm[(r.key, r.window_start)]
        assert lo - 1e-9 <= r.twap <= hi + 1e-9
        if r.n_ticks == 1:
            assert abs(r.twap - lo) < 1e-9  # single tick: TWAP == price


def test_ema_matches_direct_recursion(spark, ticks):
    import numpy as np

    from data_timeseries_java_spark.operators import log_returns
    from data_timeseries_java_spark.operators.candles import candles_pipeline
    from data_timeseries_java_spark.operators.ema import ema

    r = log_returns(candles_pipeline(ticks, ticks.select("key").distinct(),
                                     "1 hour"))
    out = ema(r, alpha=0.3)
    rows = [x for x in out.collect() if x.key == "click"]
    rows.sort(key=lambda x: x.time)
    xs = np.array([x.value for x in rows])
    want = np.empty_like(xs)
    want[0] = xs[0]
    for i in range(1, len(xs)):
        want[i] = 0.3 * xs[i] + 0.7 * want[i - 1]
    got = np.array([x.ema for x in rows])
    assert np.allclose(got, want, atol=1e-12)


def test_asof_join_semantics(spark):
    """<= matching, per-key isolation, no-prior-row dropping."""
    from datetime import datetime, timezone

    from data_timeseries_java_spark.operators.temporal import asof_join

    t = lambda m: datetime(2024, 9, 1, 0, m, tzinfo=timezone.utc)
    left = spark.createDataFrame(
        [("A", t(5), 1.0), ("A", t(10), 2.0), ("B", t(3), 3.0)],
        "k string, ts timestamp, v double")
    right = spark.createDataFrame(
        [("A", t(5), 50.0), ("A", t(7), 70.0), ("B", t(9), 90.0)],
        "k string, ts timestamp, r double")
    out = {(x.k, x.ts.minute): (x.r_asof, x.ts_asof.minute)
           for x in asof_join(left, right, on="k", left_time="ts",
                              right_time="ts").collect()}
    assert out[("A", 5)] == (50.0, 5)    # simultaneous row matches (<=)
    assert out[("A", 10)] == (70.0, 7)   # latest prior
    assert ("B", 3) not in out           # no prior right row → dropped


def test_asof_join_tolerance(spark):
    """tolerance= drops matches older than left_time - tolerance (the
    pandas merge_asof stale-quote guard)."""
    from datetime import datetime, timezone

    from data_timeseries_java_spark.operators.temporal import asof_join

    t = lambda m: datetime(2024, 9, 1, 0, m, tzinfo=timezone.utc)
    left = spark.createDataFrame(
        [("A", t(5), 1.0), ("A", t(30), 2.0)],
        "k string, ts timestamp, v double")
    right = spark.createDataFrame(
        [("A", t(4), 40.0)], "k string, ts timestamp, r double")
    out = {x.ts.minute: x.r_asof
           for x in asof_join(left, right, on="k", left_time="ts",
                              right_time="ts",
                              tolerance="10 minutes").collect()}
    assert out == {5: 40.0}   # the minute-30 match is 26 min stale
    # boundary: exactly tolerance-old still matches
    out2 = {x.ts.minute: x.r_asof
            for x in asof_join(left, right, on="k", left_time="ts",
                               right_time="ts",
                               tolerance="26 minutes").collect()}
    assert out2 == {5: 40.0, 30: 40.0}


def test_stochastic_bounds_and_flat_channel(spark, ticks):
    """%K in [0,100] whenever defined; NULL exactly when the trailing
    channel is flat (hi == lo, e.g. an all-gap run)."""
    from data_timeseries_java_spark.operators.candles import candles_pipeline
    from data_timeseries_java_spark.operators.resample import (
        stochastic_oscillator)

    c = candles_pipeline(ticks, ticks.select("key").distinct(), "1 hour")
    rows = stochastic_oscillator(c).collect()
    assert rows
    seen_null = seen_val = False
    for r in rows:
        if r.pct_k is None:
            assert r.channel_high == r.channel_low
            seen_null = True
        else:
            assert -1e-9 <= r.pct_k <= 100 + 1e-9
            assert r.channel_low <= r.close_price <= r.channel_high
            seen_val = True
    assert seen_val and seen_null  # corpus has both live runs and gap runs


def test_atr_zero_on_gap_runs_and_nonnegative(spark, ticks):
    """Gap candles carry hi=lo=close -> TR==0 there; ATR >= 0 always and
    ATR <= max TR in its frame."""
    from data_timeseries_java_spark.operators.candles import candles_pipeline
    from data_timeseries_java_spark.operators.resample import (
        average_true_range)

    c = candles_pipeline(ticks, ticks.select("key").distinct(), "1 hour")
    out = average_true_range(c)
    joined = out.join(
        c.select("key", "window_start", "is_live"), ["key", "window_start"])
    prev_live = None
    for r in sorted(joined.collect(), key=lambda r: (r.key, r.window_start)):
        assert r.true_range >= -1e-12
        assert r.atr >= -1e-12
        if prev_live is not None and not r.is_live and not prev_live:
            # interior of a gap run: flat carry -> zero range
            assert r.true_range == 0.0
        prev_live = r.is_live


def test_obv_telescopes_to_signed_volume_sum(spark, ticks):
    """OBV is the running sum of signed volumes per key — the final OBV
    equals the plain sum, and each step moves by exactly +/-volume or 0."""
    from data_timeseries_java_spark.operators.resample import (
        on_balance_volume)

    rows = on_balance_volume(ticks, "1 hour").collect()
    assert rows
    by_key = {}
    for r in sorted(rows, key=lambda r: (r.key, r.window_start)):
        prev = by_key.get(r.key, 0)
        assert r.obv - prev == r.signed_volume
        assert abs(r.signed_volume) in (0, r.volume)
        by_key[r.key] = r.obv


def test_macd_converges_on_constant_series(spark):
    """On a constant price series MACD, signal, histogram are all
    exactly 0 at every step (both EMAs equal the constant)."""
    from data_timeseries_java_spark.operators.ema import macd

    rows = [("k", i, 42.5) for i in range(50)]
    df = spark.createDataFrame(rows, "key string, time long, value double")
    out = macd(df).collect()
    assert len(out) == 50
    for r in out:
        assert r.macd == 0.0 and r.signal == 0.0 and r.histogram == 0.0
