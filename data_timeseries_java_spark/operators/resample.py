"""Resampling operators: hierarchical candle rollup and TWAP.

Hypertable-style rollup: coarser-resolution candles derive from finer
candles, NOT from a rescan of raw ticks — at 100 TB the 1-minute candle
table is ~3 orders of magnitude smaller than the tick table, so rolling
1m → 1h → 1d touches progressively tiny inputs. OHLC composes exactly:
open = earliest constituent's open, close = latest constituent's close,
min/max = extrema of constituent extrema (whole-tick structs retained,
matching TSAggValueProto semantics).

TWAP (time-weighted average price): each tick's price weighted by its
holding time — until the next tick, or the window end for the last tick
(no carry into the window; gap-fill handles cross-window continuity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rollup_candles(candles: DataFrame, resolution: str) -> DataFrame:
    """Roll complete candles up to a coarser resolution (must be a
    multiple of the input resolution; windows are epoch-aligned so the
    coarse bucket is pure integer math on window_start)."""
    res = F.expr(f"INTERVAL {resolution}")
    ws_ms = F.unix_millis("window_start")
    res_ms = F.unix_millis(F.lit("1970-01-01 00:00:00").cast("timestamp") + res)
    # integer bucket math (ms - ms % res); float division near exact
    # multiples is one rounding error away from the wrong bucket
    coarse = F.timestamp_millis(ws_ms - (ws_ms % res_ms))

    g = candles.withColumn("w2", coarse).groupBy("key", "w2").agg(
        F.min(F.struct(F.col("window_start").alias("ws"),
                       F.col("open").alias("v"))).alias("o"),
        F.max(F.struct(F.col("window_start").alias("ws"),
                       F.col("close").alias("v"))).alias("c"),
        F.min(F.struct(F.col("min_ask.ask").alias("p"),
                       F.col("window_start").alias("ws"),
                       F.col("min_ask").alias("v"))).alias("mna"),
        F.max(F.struct(F.col("max_ask.ask").alias("p"),
                       (-F.unix_millis("window_start")).alias("nws"),
                       F.col("max_ask").alias("v"))).alias("mxa"),
        F.min(F.struct(F.col("min_bid.bid").alias("p"),
                       F.col("window_start").alias("ws"),
                       F.col("min_bid").alias("v"))).alias("mnb"),
        F.max(F.struct(F.col("max_bid.bid").alias("p"),
                       (-F.unix_millis("window_start")).alias("nws"),
                       F.col("max_bid").alias("v"))).alias("mxb"),
        F.max("is_live").alias("is_live"),
    )
    return g.select(
        "key",
        F.col("w2").alias("window_start"),
        (F.col("w2") + res).alias("window_end"),
        F.col("o.v").alias("open"),
        F.col("c.v").alias("close"),
        F.col("mna.v").alias("min_ask"),
        F.col("mxa.v").alias("max_ask"),
        F.col("mnb.v").alias("min_bid"),
        F.col("mxb.v").alias("max_bid"),
        "is_live",
    )


def twap(ticks: DataFrame, resolution: str = "1 hour",
         price_col: str = "ask") -> DataFrame:
    """Time-weighted average price per (key, fixed window).

    Weight of tick i = time until the next tick in the same window, or
    until window end for the last tick. Ticks at the window's end-1ms
    (gap rows) get zero weight naturally; windows with a single tick
    weight it across the remaining window span.
    """
    w = F.window("event_time", resolution)
    t_ms = F.unix_millis("event_time")
    df = ticks.select("key", w.alias("w"), t_ms.alias("t_ms"),
                      F.col(price_col).alias("price"))
    wk = Window.partitionBy("key", "w").orderBy("t_ms")
    dt = (F.coalesce(F.lead("t_ms").over(wk), F.unix_millis(F.col("w.end")))
          - F.col("t_ms"))
    weighted = df.withColumn("dt", dt)
    return weighted.groupBy("key", "w").agg(
        (F.sum(F.col("price") * F.col("dt")) / F.sum("dt")).alias("twap"),
        F.count(F.lit(1)).alias("n_ticks"),
    ).select(
        "key",
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "twap", "n_ticks",
    )


def bollinger_bands(candles: DataFrame, n_windows: int = 6,
                    k: float = 2.0, price=None) -> DataFrame:
    """Bollinger bands over candle closes: rolling mean ± k·stddev across
    the trailing n candle windows (row frame — candles are equidistant
    after gap-fill). First window's stddev is NULL (sample stddev of 1)."""
    price = price if price is not None else F.col("close.ask")
    w = (Window.partitionBy("key").orderBy("window_start")
         .rowsBetween(-(n_windows - 1), 0))
    mid = F.avg(price).over(w)
    sd = F.stddev_samp(price).over(w)
    return candles.select(
        "key", "window_start", "window_end",
        price.alias("close_price"),
        mid.alias("bb_mid"),
        (mid + k * sd).alias("bb_upper"),
        (mid - k * sd).alias("bb_lower"),
    )


def rsi(candles: DataFrame, n_windows: int = 6, price=None) -> DataFrame:
    """Relative Strength Index (Cutler's variant: simple moving averages
    of gains/losses over the trailing n candles — the EMA-smoothed Wilder
    variant lives with the other recursive ops in ema.py). RSI=100 when
    no losses in the lookback; NULL until a prior close exists."""
    price = price if price is not None else F.col("close.ask")
    wk = Window.partitionBy("key").orderBy("window_start")
    delta = price - F.lag(price).over(wk)
    d = candles.select("key", "window_start", "window_end",
                       price.alias("close_price"), delta.alias("delta"))
    frame = (Window.partitionBy("key").orderBy("window_start")
             .rowsBetween(-(n_windows - 1), 0))
    gain = F.avg(F.when(F.col("delta") > 0, F.col("delta")).otherwise(
        F.when(F.col("delta").isNotNull(), 0.0))).over(frame)
    loss = F.avg(F.when(F.col("delta") < 0, -F.col("delta")).otherwise(
        F.when(F.col("delta").isNotNull(), 0.0))).over(frame)
    # avg() skips NULL deltas, so gain/loss are NULL only when the frame
    # holds no delta at all (the key's first candle)
    rsi_col = (F.when(gain.isNull(), F.lit(None).cast("double"))
               .when(loss == 0, 100.0)
               .otherwise(100.0 - 100.0 / (1.0 + gain / loss)))
    return d.select("key", "window_start", "window_end", "close_price",
                    gain.alias("avg_gain"), loss.alias("avg_loss"),
                    rsi_col.alias("rsi"))


def interpolate_candles(candles: DataFrame,
                        price: F.Column | None = None) -> DataFrame:
    """Linear-interpolation gap fill: where carry-forward
    (:func:`~data_timeseries_java_spark.operators.candles.complete_candles`)
    holds the last live close flat through gap windows, this derives the
    straight line between the bounding LIVE closes — the standard
    alternative fill for downstream indicators that would otherwise see
    a step function.

    Per (key, window): live candles keep their close price; interior
    gaps interpolate between the previous and next live close by
    window-position fraction; leading gaps back-fill from the next live
    close; trailing gaps carry the previous one (both one-sided bounds).

    Shape: two window passes over ``partitionBy(key)`` — same shuffle
    the carry-forward already does (candle-sized data, 1 row per key per
    interval, no skew), nothing touches the tick scan.

    The "next live close" is the ASC ``first(...) over (1, unbounded
    following)`` by definition, but that frame shape is QUADRATIC in
    Spark: a moving lower bound with an unbounded-following upper lands
    on UnboundedFollowingWindowFunctionFrame, which re-aggregates the
    remaining rows for every row — O(n²) per key partition (measured:
    578s at the 100x decade, 194x the fx family median, vs 3.5s fixed;
    SCALE.md §outlier-audit). The same value is computed here as the
    DESC ``last(ignorenulls) over (unboundedPreceding, -1)`` — a
    growing frame Spark evaluates incrementally, O(n); costs one extra
    in-partition sort, no extra shuffle. The plan scan in
    tests/test_plans.py bans the quadratic frame shape registry-wide.
    """
    price = price if price is not None else F.col("close.ask")
    ws_ms = F.unix_millis("window_start")
    wk = Window.partitionBy("key").orderBy("window_start")
    prev = wk.rowsBetween(Window.unboundedPreceding, -1)
    wk_desc = Window.partitionBy("key").orderBy(F.col("window_start").desc())
    after = wk_desc.rowsBetween(Window.unboundedPreceding, -1)

    live_val = F.when(F.col("is_live"), price)
    live_ws = F.when(F.col("is_live"), ws_ms)
    pv = F.last(live_val, ignorenulls=True).over(prev)
    pw = F.last(live_ws, ignorenulls=True).over(prev)
    nv = F.last(live_val, ignorenulls=True).over(after)
    nw = F.last(live_ws, ignorenulls=True).over(after)

    frac = (ws_ms - pw) / (nw - pw)
    interp = (F.when(F.col("is_live"), price)
              .when(pv.isNotNull() & nv.isNotNull(), pv + frac * (nv - pv))
              .when(pv.isNotNull(), pv)
              .otherwise(nv))
    return candles.select(
        "key", "window_start", "window_end", "is_live",
        price.alias("carry_price"),
        interp.alias("interp_price"),
    )


def rolling_median(df: DataFrame, key_col: str, time_col: str,
                   value_col: str, n: int = 5,
                   tiebreak_col: str | None = None) -> DataFrame:
    """Exact rolling median over the trailing ``n`` rows per key.

    Spark has no exact-median window function (percentile_approx is a
    sketch); for a small fixed frame the exact answer is a sorted
    collect_list over the frame — O(n log n) per row with tiny constant
    n, still a single window pass on the key-partitioned shuffle. Even
    frames use the interpolated (quantile_cont) convention: the mean of
    the two middle values, matching DuckDB/Postgres ``median``.
    """
    order = [F.col(time_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w = (Window.partitionBy(key_col).orderBy(*order)
         .rowsBetween(-(n - 1), Window.currentRow))
    arr = F.array_sort(F.collect_list(F.col(value_col)).over(w))
    sz = F.size(arr)
    mid = (sz + 1) / 2
    odd = F.element_at(arr, F.floor(mid).cast("int"))
    even = (F.element_at(arr, (sz / 2).cast("int"))
            + F.element_at(arr, (sz / 2 + 1).cast("int"))) / 2
    med = F.when(sz % 2 == 1, odd).otherwise(even)
    return df.withColumn(f"median_{n}", med)


def realized_volatility(returns: DataFrame,
                        resolution: str = "1 day") -> DataFrame:
    """Per (key, tumbling window) realized volatility: sqrt of the sum
    of squared log returns — the standard high-frequency vol estimator
    (sum-of-squares is decomposable, so map-side partial aggregation
    applies; one shuffle on (key, window)).

    Input: the log-returns frame (key, time, value). Output: (key,
    window_start, n_rets, realized_vol).
    """
    w = F.window("time", resolution)
    return (returns
            .groupBy("key", w.alias("w"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_rets"),
                 F.sqrt(F.sum(F.col("value") * F.col("value")))
                 .alias("realized_vol"))
            .select("key", F.col("w.start").alias("window_start"),
                    "n_rets", "realized_vol"))


def max_drawdown(candles: DataFrame, price: F.Column | None = None) -> DataFrame:
    """Per-key maximum drawdown over the candle series: the largest
    peak-to-trough loss fraction (running max of the close, drawdown =
    (peak - close) / peak, maximized). One window pass + one aggregate
    on the same key-partitioned shuffle; candle-sized data.
    """
    price = price if price is not None else F.col("close.ask")
    w = (Window.partitionBy("key").orderBy("window_start")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    peak = F.max(price).over(w)
    dd = F.when(peak > 0, (peak - price) / peak).otherwise(F.lit(0.0))
    per_row = candles.select("key", price.alias("price"), peak.alias("peak"),
                             dd.alias("drawdown"))
    return per_row.groupBy("key").agg(
        F.count(F.lit(1)).cast("long").alias("n_windows"),
        F.round(F.max("peak"), 6).alias("peak_price"),
        F.floor(F.max("drawdown") * 1_000_000).cast("double").alias("_mdd6"),
    ).select("key", "n_windows", "peak_price",
             (F.col("_mdd6") / 1_000_000).alias("max_drawdown"))


def stochastic_oscillator(candles: DataFrame, n_windows: int = 6,
                          d_windows: int = 3) -> DataFrame:
    """Stochastic oscillator over complete candles: %K locates the close
    within the trailing n-candle high/low channel, %D smooths %K with a
    d-candle simple moving average (the classic %K/%D formulation —
    Lane's oscillator — on candle data).

        %K = 100 · (close − min(low, n)) / (max(high, n) − min(low, n))
        %D = SMA(%K, d)

    Highs/lows come from the candle min/max ask ticks; gap candles carry
    the filled close for all three (see complete_candles), so a flat gap
    run collapses the channel — %K is NULL there (zero-width channel)
    and %D averages only the defined %K values in its frame.

    Shape: two window passes on the same key-partitioned candle-sized
    sort — no extra shuffle beyond the candle pipeline's own.
    """
    frame = (Window.partitionBy("key").orderBy("window_start")
             .rowsBetween(-(n_windows - 1), 0))
    close = F.col("close.ask")
    hi = F.max(F.col("max_ask.ask")).over(frame)
    lo = F.min(F.col("min_ask.ask")).over(frame)
    k = F.when(hi > lo, 100.0 * (close - lo) / (hi - lo))
    base = candles.select("key", "window_start", "window_end",
                          close.alias("close_price"),
                          hi.alias("channel_high"), lo.alias("channel_low"),
                          k.alias("pct_k"))
    dframe = (Window.partitionBy("key").orderBy("window_start")
              .rowsBetween(-(d_windows - 1), 0))
    return base.withColumn("pct_d", F.avg("pct_k").over(dframe))


def average_true_range(candles: DataFrame, n_windows: int = 6) -> DataFrame:
    """Average True Range over complete candles (Wilder's range measure,
    SMA-smoothed — Cutler-style, consistent with this module's rsi; the
    EMA-smoothed variant belongs with the recursive ops in ema.py).

        TR_t  = max(high−low, |high−prev_close|, |low−prev_close|)
        ATR_t = SMA(TR, n)

    The first candle per key has no prev_close: TR falls back to
    high−low. Gap candles have high = low = close = carried prev close,
    so TR = 0 there — gaps correctly contribute no range.

    Shape: one lag + one trailing average over the same key-partitioned
    sort; candle-sized data, no extra shuffle.
    """
    wk = Window.partitionBy("key").orderBy("window_start")
    hi = F.col("max_ask.ask")
    lo = F.col("min_ask.ask")
    prev_close = F.lag(F.col("close.ask")).over(wk)
    tr = F.when(
        prev_close.isNull(), hi - lo
    ).otherwise(F.greatest(hi - lo, F.abs(hi - prev_close),
                           F.abs(lo - prev_close)))
    base = candles.select("key", "window_start", "window_end",
                          hi.alias("high"), lo.alias("low"),
                          F.col("close.ask").alias("close_price"),
                          tr.alias("true_range"))
    frame = (Window.partitionBy("key").orderBy("window_start")
             .rowsBetween(-(n_windows - 1), 0))
    return base.withColumn("atr", F.avg("true_range").over(frame))


def on_balance_volume(ticks: DataFrame, resolution: str = "1 hour") -> DataFrame:
    """On-balance volume per (key, tumbling window), with per-window tick
    count as the volume proxy (the events stream carries no size field):
    OBV starts at 0 and adds the window's volume when the close rises,
    subtracts it when it falls, holds on unchanged.

    Defined over LIVE windows only: a gap window has zero volume and an
    unchanged carry-forward close, so it contributes exactly 0 — skipping
    gap rows leaves every OBV value identical while avoiding the
    gap-frame join entirely.

    Shape: one map-side-combinable aggregate on (key, window) — count
    plus a max-by-time struct for the close — then a lag + running sum on
    the candle-sized result. One shuffle total.
    """
    t_ms = F.unix_millis(F.col("event_time"))
    agg = (ticks.where(F.col("is_live"))
           .groupBy("key", F.window("event_time", resolution).alias("w"))
           .agg(F.count(F.lit(1)).cast("long").alias("volume"),
                F.max(F.struct(t_ms.alias("t"), F.col("ask"))).alias("cl")))
    wk = Window.partitionBy("key").orderBy("w.start")
    close = F.col("cl.ask")
    delta = close - F.lag(close).over(wk)
    signed = (F.when(delta.isNull() | (delta == 0), F.lit(0).cast("long"))
              .when(delta > 0, F.col("volume"))
              .otherwise(-F.col("volume")))
    run = (Window.partitionBy("key").orderBy("window_start")
           .rowsBetween(Window.unboundedPreceding, 0))
    return (agg.select("key", F.col("w.start").alias("window_start"),
                       "volume", close.alias("close_price"),
                       signed.alias("signed_volume"))
            .withColumn("obv", F.sum("signed_volume").over(run)))
