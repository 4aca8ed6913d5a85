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
