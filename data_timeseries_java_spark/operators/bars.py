"""Event-based bars and liquidity measures over tick streams.

The reference's pipeline is strictly time-bar shaped (fixed windows —
`/root/reference/src/main/java/.../CreateCandlesFn.java`); this module
adds the event-driven bar family a market-data engine is expected to
carry (tick bars, anchored VWAP, volume-bucket VPIN, Amihud
illiquidity, price-volume profile). All are built from the same two
Spark shapes the candle pipeline already uses — one key-partitioned
sort serving window functions, and one map-side-combinable aggregate —
so they inherit its scale story: per-key parallelism, no driver
collects, no cross-key shuffles beyond the grouping itself.

Scale notes (100 TB): every operator here shuffles once on `key` (or
(key, window)) and then stays within the partition. Tick bars and VPIN
need a per-key total order — that is a per-key sort, exactly what a
1000-executor range-partitioned sort does well; nothing is quadratic
and no state exceeds the largest single key's tick count per window of
interest. Volume profile's per-key min/max is a tiny two-row-per-key
aggregate broadcast back onto the stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def anchored_vwap(ticks: DataFrame, resolution: str = "1 hour",
                  anchor_ms: int = 86_400_000) -> DataFrame:
    """Anchored (session) VWAP: within each anchor period (default one
    day) the running volume-weighted average price up to and including
    each resolution window. The events stream carries no size field, so
    volume is the tick count — the same proxy as on_balance_volume.

    Shape: one (key, window) aggregate (sum price, count) — map-side
    combinable — then a cumulative sum over the candle-sized result
    partitioned by (key, anchor). Output is candle-sized, not
    tick-sized, so a 100 TB tick stream reduces before the window pass.
    """
    agg = (ticks.where(F.col("is_live"))
           .groupBy("key",
                    F.window("event_time", resolution).alias("w"))
           .agg(F.sum("ask").alias("sum_price"),
                F.count(F.lit(1)).cast("long").alias("volume")))
    w_start_ms = F.unix_millis(F.col("w.start"))
    day = (F.floor(w_start_ms / F.lit(anchor_ms)) * anchor_ms)
    run = (Window.partitionBy("key", "anchor_ms")
           .orderBy("w_start_ms")
           .rowsBetween(Window.unboundedPreceding, 0))
    base = agg.select(
        "key", w_start_ms.alias("w_start_ms"), day.alias("anchor_ms"),
        "sum_price", "volume")
    # running sums are rounded to 6 decimals before the divide: input
    # prices are exact 2-decimal values, so the true sums carry at most
    # 2 decimals and the round strips only engine/order-dependent FP
    # summation noise (~1e-12) that would otherwise flip the output's
    # 6th decimal between equally-correct summation orders
    return base.select(
        "key", "w_start_ms", "anchor_ms", "volume",
        (F.round(F.col("sum_price"), 6) / F.col("volume"))
        .alias("window_vwap"),
        (F.round(F.sum("sum_price").over(run), 6)
         / F.sum("volume").over(run)).alias("anchored_vwap"),
    )


def tick_bars(ticks: DataFrame, bar_size: int = 50) -> DataFrame:
    """Fixed-tick-count bars (the simplest event-driven bar: every bar
    holds exactly `bar_size` consecutive ticks of one key; the final
    partial bar is kept and carries its true tick count). Deterministic
    because (key, event_time) is unique in the tick stream — asserted
    by the data contract, not assumed silently.

    Shape: row_number over the key-partitioned time sort assigns
    bar ids, then one aggregate per (key, bar). The open/close picks
    use min/max over (rn, price) structs so the same aggregate pass
    yields all four OHLC fields — no second window pass.
    """
    wk = Window.partitionBy("key").orderBy("event_time")
    t_ms = F.unix_millis(F.col("event_time"))
    seq = (ticks.where(F.col("is_live"))
           .select("key", "event_time", "ask")
           .withColumn("rn", F.row_number().over(wk))
           # exact integer division (`div`), not a double divide + cast:
           # the float path is correct only while (rn-1)/bar_size is
           # exactly representable — `div` matches the oracle's `//` at
           # any row count
           .withColumn("bar", F.expr(f"(rn - 1) div {int(bar_size)}")))
    return (seq.groupBy("key", "bar")
            .agg(F.count(F.lit(1)).cast("long").alias("n_ticks"),
                 F.min(F.struct("rn", "ask")).alias("o"),
                 F.max(F.struct("rn", "ask")).alias("c"),
                 F.min("ask").alias("low"),
                 F.max("ask").alias("high"),
                 F.min(t_ms).alias("t_open_ms"),
                 F.max(t_ms).alias("t_close_ms"))
            .select("key", "bar", "n_ticks",
                    F.col("o.ask").alias("open"),
                    "high", "low",
                    F.col("c.ask").alias("close"),
                    "t_open_ms", "t_close_ms"))


def vpin(ticks: DataFrame, bucket_size: int = 50,
         n_buckets: int = 5) -> DataFrame:
    """Volume-synchronized probability of informed trading (Easley /
    Lopez de Prado / O'Hara), with tick count standing in for volume:
    classify each tick buy/sell by the tick rule (carry the last
    nonzero direction through flat prints), cut the stream into
    fixed-count buckets, and average the absolute order-flow imbalance
    |B - S| / bucket over a trailing window of buckets.

    Unclassified ticks (the leading flat run of each key) still occupy
    bucket slots but count to neither side — documented, deterministic.

    Shape: one key-partitioned sort serves the lag, the carry-forward
    AND the row_number; one aggregate per (key, bucket); one trailing
    average over the bucket-sized result.
    """
    wk = Window.partitionBy("key").orderBy("event_time")
    chg = F.col("ask") - F.lag("ask").over(wk)
    signed = F.when(chg > 0, 1).when(chg < 0, -1)  # NULL on flat/first
    seq = (ticks.where(F.col("is_live"))
           .select("key", "event_time", "ask")
           .withColumn("s", signed)
           .withColumn("dir", F.last("s", ignorenulls=True).over(
               wk.rowsBetween(Window.unboundedPreceding, 0)))
           .withColumn("rn", F.row_number().over(wk))
           # integer `div` for the same exactness reason as tick_bars
           .withColumn("bucket",
                       F.expr(f"(rn - 1) div {int(bucket_size)}")))
    g = (seq.groupBy("key", "bucket")
         .agg(F.count(F.lit(1)).cast("long").alias("n_ticks"),
              F.sum(F.when(F.col("dir") == 1, 1).otherwise(0))
              .cast("long").alias("n_buy"),
              F.sum(F.when(F.col("dir") == -1, 1).otherwise(0))
              .cast("long").alias("n_sell")))
    imb = (F.abs(F.col("n_buy") - F.col("n_sell"))
           / F.col("n_ticks"))
    trail = (Window.partitionBy("key").orderBy("bucket")
             .rowsBetween(-(n_buckets - 1), 0))
    return (g.withColumn("imbalance", imb)
            .withColumn("vpin", F.avg("imbalance").over(trail)))


def amihud_illiquidity(ticks: DataFrame, resolution: str = "1 hour",
                       n_windows: int = 6) -> DataFrame:
    """Amihud (2002) illiquidity: trailing mean of |return| / volume
    per (key, window), the classic price-impact-per-unit-volume proxy.
    Returns are close-over-previous-close of LIVE windows (gap windows
    have no trades, hence no volume, hence no defined ratio — they are
    skipped entirely, so the previous live close is the right base).
    The first live window per key has no base and is excluded from the
    trailing mean but still emitted with a null ratio.

    Shape: one (key, window) map-side-combinable aggregate, then lag +
    trailing average over the candle-sized result.
    """
    t_ms = F.unix_millis(F.col("event_time"))
    agg = (ticks.where(F.col("is_live"))
           .groupBy("key", F.window("event_time", resolution).alias("w"))
           .agg(F.count(F.lit(1)).cast("long").alias("volume"),
                F.max(F.struct(t_ms.alias("t"), F.col("ask")))
                .alias("cl")))
    wk = Window.partitionBy("key").orderBy("w.start")
    close = F.col("cl.ask")
    ret = F.log(close / F.lag(close).over(wk))
    base = agg.select(
        "key", F.unix_millis(F.col("w.start")).alias("w_start_ms"),
        "volume", close.alias("close_price"), ret.alias("ret"))
    ratio = F.abs(F.col("ret")) / F.col("volume")
    trail = (Window.partitionBy("key").orderBy("w_start_ms")
             .rowsBetween(-(n_windows - 1), 0))
    return (base.withColumn("illiq", ratio)
            .withColumn("amihud", F.avg(ratio).over(trail)))


def volume_profile(ticks: DataFrame, n_bins: int = 20) -> DataFrame:
    """Price-volume profile per key: tick volume histogram over
    `n_bins` equal-width price bins spanning the key's [min, max] ask
    range, with the point of control (max-volume bin; lowest bin wins
    ties) flagged. The top-of-range tick lands in the last bin.

    Shape: a two-column per-key extent aggregate (tiny — one row per
    instrument) broadcast back onto the stream, then one (key, bin)
    count and one per-key max for the POC flag. Nothing here grows
    with tick count except the single histogram aggregate.
    """
    live = ticks.where(F.col("is_live")).select("key", "ask")
    extent = (live.groupBy("key")
              .agg(F.min("ask").alias("p_min"),
                   F.max("ask").alias("p_max")))
    j = live.join(F.broadcast(extent), "key")
    width = (F.col("p_max") - F.col("p_min")) / n_bins
    raw_bin = F.when(
        F.col("p_max") == F.col("p_min"), F.lit(0)
    ).otherwise(F.floor((F.col("ask") - F.col("p_min")) / width))
    binned = j.select(
        "key", "p_min", "p_max",
        F.least(raw_bin.cast("long"), F.lit(n_bins - 1)).alias("bin"))
    hist = (binned.groupBy("key", "bin")
            .agg(F.count(F.lit(1)).cast("long").alias("volume"),
                 F.first("p_min").alias("p_min"),
                 F.first("p_max").alias("p_max")))
    width_out = (F.col("p_max") - F.col("p_min")) / n_bins
    poc = Window.partitionBy("key")
    best = F.min(F.struct(-F.col("volume"), F.col("bin"))).over(poc)
    return hist.select(
        "key", "bin", "volume",
        (F.col("p_min") + F.col("bin") * width_out).alias("bin_low"),
        (F.col("p_min") + (F.col("bin") + 1) * width_out)
        .alias("bin_high"),
        (F.col("bin") == best.getField("bin")).alias("is_poc"),
    )


def donchian_channels(candles: DataFrame, n_windows: int = 6) -> DataFrame:
    """Donchian channel over complete candles: upper = max high and
    lower = min low of the PRIOR `n_windows` candles (the current
    candle is excluded, so a breakout compares today's close against
    yesterday's channel — the textbook turtle rule). Candles with no
    full prior channel (the first per key) emit null channel fields.

    Shape: two trailing-frame window functions over the candle
    pipeline's existing key-partitioned sort; no extra shuffle.
    """
    prior = (Window.partitionBy("key").orderBy("window_start")
             .rowsBetween(-n_windows, -1))
    hi = F.col("max_ask.ask")
    lo = F.col("min_ask.ask")
    close = F.col("close.ask")
    base = candles.select(
        "key", "window_start",
        close.alias("close_price"),
        F.max(hi).over(prior).alias("channel_high"),
        F.min(lo).over(prior).alias("channel_low"))
    return base.select(
        "key", "window_start", "close_price", "channel_high",
        "channel_low",
        (F.col("channel_high") + F.col("channel_low")).alias("_s"),
        (F.col("close_price") > F.col("channel_high"))
        .alias("breakout_up"),
        (F.col("close_price") < F.col("channel_low"))
        .alias("breakout_down"),
    ).select("key", "window_start", "close_price", "channel_high",
             "channel_low", (F.col("_s") / 2).alias("channel_mid"),
             "breakout_up", "breakout_down")


def dollar_bars(ticks: DataFrame, threshold: float = 5_000.0) -> DataFrame:
    """Value-threshold bars (the "dollar bar" of the event-driven bar
    family): a tick belongs to bar floor(preceding_cum_value / T), so a
    new bar opens exactly when cumulative traded value crosses a
    multiple of T. With no size field, each tick's value is its price —
    the same proxy discipline as the tick-count volume elsewhere.

    Determinism note: the cumulative sum is a SEQUENTIAL fold in
    (key, event_time) order in any engine, so the double is
    bit-identical cross-engine (unlike a reduction-order-free
    aggregate) and the floor cannot straddle engines differently.

    Shape: identical to tick_bars — one key-partitioned sort (serving
    the running sum), one OHLC aggregate per (key, bar).
    """
    wk = Window.partitionBy("key").orderBy("event_time")
    prev_cum = F.coalesce(
        F.sum("ask").over(wk.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0.0))
    t_ms = F.unix_millis(F.col("event_time"))
    seq = (ticks.where(F.col("is_live"))
           .select("key", "event_time", "ask")
           .withColumn("rn", F.row_number().over(wk))
           .withColumn("bar", F.floor(prev_cum / threshold)))
    return (seq.groupBy("key", "bar")
            .agg(F.count(F.lit(1)).cast("long").alias("n_ticks"),
                 F.sum("ask").alias("bar_value"),
                 F.min(F.struct("rn", "ask")).alias("o"),
                 F.max(F.struct("rn", "ask")).alias("c"),
                 F.min("ask").alias("low"),
                 F.max("ask").alias("high"),
                 F.min(t_ms).alias("t_open_ms"),
                 F.max(t_ms).alias("t_close_ms"))
            .select("key", "bar", "n_ticks", "bar_value",
                    F.col("o.ask").alias("open"),
                    "high", "low",
                    F.col("c.ask").alias("close"),
                    "t_open_ms", "t_close_ms"))


IMBALANCE_OUT_SCHEMA = ("key string, bar long, n_ticks long, "
                        "n_buy long, n_sell long, imbalance long, "
                        "open double, close double, "
                        "t_open_ms long, t_close_ms long")


def imbalance_bars(ticks: DataFrame, threshold: int = 7) -> DataFrame:
    """Order-flow imbalance bars (the third event-driven bar type): a
    bar closes the moment the absolute running signed-tick imbalance
    since the bar opened reaches `threshold`. Unlike tick/dollar bars
    the boundary depends on a reset-at-boundary running sum — a
    genuinely sequential recursion, not a floor of a global cumsum —
    with the oracle replaying the identical recursion in a RECURSIVE
    CTE.

    Signs use the tick rule with carry-through-flat (dir of the
    leading flat run is 0 — counted to neither side, contributing
    nothing to the imbalance, same convention as vpin). The final
    in-flight bar is emitted with its partial imbalance.

    Shape (bounded-memory): one shuffle on key, a per-partition
    EXTERNAL sort on (key, event_time) — Spark's sort spills, it never
    needs a key in memory — then a single streaming pass over Arrow
    batches (`mapInPandas`) carrying O(1) state per key: (bar id,
    in-flight counters, open price/time, previous price, carried
    tick-rule direction) — the exact fold `streaming/bars_stream.py:
    streaming_imbalance_bars` runs per micro-batch, reused batch-side.
    Peak Python memory is ONE Arrow batch
    (spark.sql.execution.arrow.maxRecordsPerBatch, default 10k rows),
    NOT a key's full tick history — a hot instrument with billions of
    ticks streams through instead of materializing in one pandas
    frame. Parallelism unit is the shuffle partition; the recursion
    itself stays serial per instrument, which is inherent.
    """
    fold = make_imbalance_fold(threshold)

    return (ticks.where(F.col("is_live"))
            .select("key", "event_time", "ask")
            .repartition("key")
            .sortWithinPartitions("key", "event_time")
            .mapInPandas(fold, IMBALANCE_OUT_SCHEMA))


def make_imbalance_fold(threshold: int):
    """The imbalance-bar lattice fold as a standalone mapInPandas
    function — factored out of :func:`imbalance_bars` so tests can
    drive it with hand-built Arrow chunk sequences (incl. empty
    chunks, which Arrow may legally yield mid-iterator)."""
    import numpy as np
    import pandas as pd

    cols = ["key", "bar", "n_ticks", "n_buy", "n_sell", "imbalance",
            "open", "close", "t_open_ms", "t_close_ms"]

    def fold(batches):
        # carried per-key state; a batch boundary may fall anywhere,
        # including mid-bar — state crosses it untouched
        key = None
        bar = n = buy = sell = imb = 0
        open_px = 0.0
        t_open = 0
        prev = float("nan")   # previous price (NaN = none yet)
        last = 0              # carried tick-rule direction
        seen_px, seen_ts = 0.0, 0

        def partial():
            return (key, bar, n, buy, sell, imb,
                    open_px, seen_px, t_open, seen_ts)

        def run_segment(px, ts, out):
            # Fully vectorized block-scan of one key's slice of one
            # Arrow batch. The recursion (imbalance resets at each bar
            # close) LOOKS sequential, but every tick moves the running
            # imbalance by -1/0/+1, so the running total in global
            # sign-cumsum space is imb_carry + C_i with bar bases
            # confined to the lattice {-imb_carry + k*threshold}: a bar
            # closes exactly at each index where C touches a lattice
            # point WHOSE VALUE DIFFERS from the previous touch
            # (touching the current base again is imbalance 0, not a
            # close). Closes, per-bar counters, opens and closes are
            # therefore all fancy-indexed numpy — zero per-tick AND
            # zero per-bar Python.
            nonlocal bar, n, buy, sell, imb, open_px, t_open, \
                prev, last, seen_px, seen_ts
            m = len(px)
            d = np.empty(m)
            d[0] = px[0] - prev  # NaN when no previous price
            if m > 1:
                d[1:] = px[1:] - px[:-1]
            raw = np.where(d > 0, 1, np.where(d < 0, -1, 0))
            # carry-through-flat: forward-fill the last nonzero sign,
            # seeded by the carried direction (0 through a key's
            # leading flat run)
            nzidx = np.where(raw != 0, np.arange(m), -1)
            np.maximum.accumulate(nzidx, out=nzidx)
            s = np.where(nzidx >= 0, raw[np.clip(nzidx, 0, None)],
                         last).astype(np.int64)
            C = np.cumsum(s)
            lat = np.flatnonzero((C + imb) % threshold == 0)
            if len(lat):
                v = C[lat]
                # previous touch's value starts at the in-flight bar's
                # base (imbalance-0 point), -imb_carry in C-space
                keep = np.flatnonzero(
                    np.diff(v, prepend=np.int64(-imb)) != 0)
                closes = lat[keep]
            else:
                closes = lat  # empty
            Cb = np.cumsum(s == 1)
            Cs = np.cumsum(s == -1)
            nb = len(closes)
            if nb:
                starts = np.empty(nb, dtype=np.int64)
                starts[0] = 0
                starts[1:] = closes[:-1] + 1

                def before(A):  # A[start-1], 0 when start == 0
                    return np.where(starts > 0,
                                    A[np.maximum(starts - 1, 0)], 0)

                n_ticks = closes - starts + 1
                buys = Cb[closes] - before(Cb)
                sells = Cs[closes] - before(Cs)
                imbs = C[closes] - before(C)  # ±threshold (first: -carry)
                opens = px[starts].astype("float64").copy()
                topens = ts[starts].copy()
                # first close may complete the carried in-flight bar
                n_ticks[0] += n
                buys[0] += buy
                sells[0] += sell
                imbs[0] += imb
                if n > 0:
                    opens[0] = open_px
                    topens[0] = t_open
                out.append(pd.DataFrame({
                    "key": key,
                    "bar": bar + np.arange(nb, dtype=np.int64),
                    "n_ticks": n_ticks, "n_buy": buys, "n_sell": sells,
                    "imbalance": imbs, "open": opens,
                    "close": px[closes].astype("float64"),
                    "t_open_ms": topens, "t_close_ms": ts[closes]}))
                bar += nb
                tail = int(closes[-1]) + 1
                n = m - tail
                if n > 0:
                    jc = closes[-1]
                    buy = int(Cb[m - 1] - Cb[jc])
                    sell = int(Cs[m - 1] - Cs[jc])
                    imb = int(C[m - 1] - C[jc])
                    open_px, t_open = float(px[tail]), int(ts[tail])
                else:
                    buy = sell = imb = 0
            else:  # no close in this slice: all of it stays in-flight
                if n == 0:
                    open_px, t_open = float(px[0]), int(ts[0])
                n += m
                buy += int(Cb[m - 1])
                sell += int(Cs[m - 1])
                imb += int(C[m - 1])
            prev, last = float(px[-1]), int(s[-1])
            seen_px, seen_ts = float(px[-1]), int(ts[-1])

        for pdf in batches:
            if not len(pdf):
                continue  # Arrow may yield empty frames; segment math
                # below assumes >=1 row (ks[lo] on an empty slice raises)
            ks = pdf["key"].to_numpy()
            px = pdf["ask"].astype("float64").to_numpy()
            ts = (pdf["event_time"].astype("int64")
                  // 1_000_000).to_numpy()
            out = []
            # contiguous key segments (input is sorted by (key, time))
            bounds = np.flatnonzero(ks[1:] != ks[:-1]) + 1 \
                if len(ks) > 1 else np.array([], dtype=np.int64)
            for lo, hi in zip(np.r_[0, bounds], np.r_[bounds, len(ks)]):
                if ks[lo] != key:
                    if key is not None and n > 0:
                        out.append(pd.DataFrame([partial()],
                                                columns=cols))
                    key = ks[lo]
                    bar = n = buy = sell = imb = 0
                    prev, last = float("nan"), 0
                run_segment(px[lo:hi], ts[lo:hi], out)
            if out:
                yield pd.concat(out, ignore_index=True) \
                    if len(out) > 1 else out[0]
        if key is not None and n > 0:
            yield pd.DataFrame([partial()], columns=cols)

    return fold
