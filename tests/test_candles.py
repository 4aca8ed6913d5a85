"""Reference-parity tests for the FX candle pipeline.

Ports the reference's test suite (FXTimeSeriesPipelineSRGTests.java,
SURVEY.md §5): ingest count, gap-fill golden, TS-1 complete-candle golden
(FIXTURES.md §3/§4), plus property tests the reference lacks.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_timeseries_java_spark.fixtures import (
    T0_MS,
    demo_instruments,
    demo_ticks,
)
from data_timeseries_java_spark.operators import (
    complete_candles,
    gap_fill,
    ohlc_candles,
)

MIN = 60_000


def ms(col):
    return F.unix_millis(col)


@pytest.fixture(scope="module")
def ticks(spark):
    return demo_ticks(spark).cache()


@pytest.fixture(scope="module")
def candles(spark, ticks):
    filled = gap_fill(ticks, demo_instruments(spark), "120 seconds")
    return complete_candles(ohlc_candles(filled, "120 seconds")).cache()


def test_data_input_count(ticks):
    # FXTimeSeriesPipelineSRGTests.java:244-268 — 42 elements (not the
    # README's 44, SURVEY.md §2.9.5).
    assert ticks.count() == 42


def test_gap_fill_golden(spark, ticks):
    # FXTimeSeriesPipelineSRGTests.java:270-289 — union adds exactly two
    # is_live=false rows (TS-3, TS-4) at window-max time 1451577839999.
    out = gap_fill(ticks, demo_instruments(spark), "120 seconds").cache()
    assert out.count() == 44
    gaps = out.where(~F.col("is_live")).select(
        "key", ms(F.col("event_time")).alias("t"), "bid", "ask"
    ).orderBy("key").collect()
    assert [(r.key, r.t, r.bid, r.ask) for r in gaps] == [
        ("TS-3", 1451577839999, 0.0, 0.0),
        ("TS-4", 1451577839999, 0.0, 0.0),
    ]


def test_complete_candles_ts1_golden(candles):
    # FXTimeSeriesPipelineSRGTests.java:291-366 golden table (FIXTURES.md §4).
    rows = (candles.where(F.col("key") == "TS-1")
            .select(
                (ms(F.col("window_end")) - 1).alias("close_time"),
                ms(F.col("open.time")).alias("open_time"),
                ms(F.col("close.time")).alias("close_state_time"),
                F.col("min_ask.ask").alias("min_ask"),
                F.col("max_ask.ask").alias("max_ask"),
                F.col("min_bid.bid").alias("min_bid"),
                F.col("max_bid.bid").alias("max_bid"),
            ).orderBy("close_time").collect())
    golden = [
        (1451577719999, 1451577660000, 1451577660000, 1.0, 2.0, 1.0, 2.0),
        (1451577839999, 1451577660000, 1451577780000, 3.0, 4.0, 3.0, 4.0),
        (1451577959999, 1451577780000, 1451577900000, 5.0, 5.0, 5.0, 5.0),
        (1451578079999, 1451577900000, 1451578020000, 3.0, 4.0, 3.0, 4.0),
        (1451578199999, 1451578020000, 1451578140000, 1.0, 2.0, 1.0, 2.0),
    ]
    assert [tuple(r) for r in rows] == golden


def test_gap_candles_carry_last_live_close(candles):
    # TS-3 misses minutes 2,3 → window [2,4) is a gap candle: flat, carrying
    # the last live close (9.0 at minute 1), re-stamped to the gap row time.
    gap = (candles.where((F.col("key") == "TS-3") & ~F.col("is_live"))
           .orderBy("window_start").collect())
    assert len(gap) == 1
    g = gap[0]
    assert g.close.ask == 9.0 and g.close.bid == 9.0
    assert g.open.ask == 9.0  # previous candle's close price
    for f in ("min_ask", "max_ask", "min_bid", "max_bid"):
        assert getattr(g, f).ask == 9.0 and not getattr(g, f).is_live
    # re-stamped to the generated tick's time = window max
    assert g.close.time.timestamp() * 1000 == 1451577839999


def test_candle_count_per_key(candles):
    # 10 min / 120 s = 5 candles per key after gap-fill.
    counts = dict(
        candles.groupBy("key").count().orderBy("key").collect()
    )
    assert counts == {f"TS-{i}": 5 for i in range(1, 6)}


def test_carry_forward_invariant(candles):
    # candle_n.open == candle_{n-1}.close (price and time), all keys.
    from pyspark.sql import Window

    w = Window.partitionBy("key").orderBy("window_start")
    chk = candles.select(
        "key", "window_start", "open",
        F.lag("close").over(w).alias("prev_close"),
    ).where(F.col("prev_close").isNotNull())
    bad = chk.where(
        (F.col("open.ask") != F.col("prev_close.ask"))
        | (F.col("open.bid") != F.col("prev_close.bid"))
        | (F.col("open.time") != F.col("prev_close.time"))
    )
    assert bad.count() == 0


def test_live_candle_bounds_invariant(candles):
    # min <= open/close <= max on all-live candles (bid compares bid:
    # our corrected semantics, SURVEY.md §2.9.1; fixtures keep bid==ask).
    live = candles.where(F.col("is_live"))
    bad = live.where(
        (F.col("min_ask.ask") > F.col("close.ask"))
        | (F.col("max_ask.ask") < F.col("close.ask"))
        | (F.col("min_bid.bid") > F.col("close.bid"))
        | (F.col("max_bid.bid") < F.col("close.bid"))
    )
    assert bad.count() == 0
