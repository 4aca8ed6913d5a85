"""Streaming tick bars: count-based (event-driven) bars from a tick
stream, the non-time-window aggregation Structured Streaming's
windowed operators cannot express — bar boundaries depend on the
per-key ARRIVAL COUNT, not the clock.

Keyed state carries (total ticks seen, the in-flight partial bar);
a bar is emitted the moment its `bar_size`-th tick arrives. The
in-flight bar stays in state — exactly like an open time window
before the watermark passes — so the streaming result is "all
COMPLETED bars", and the replay gate compares against the batch
operator restricted to full bars (the batch run also emits the final
partial; a live stream by definition hasn't finished it yet).

Order contract (same as ema_stream): rows fold in event-time order
within a batch, batches arrive in per-key time order (replay
harness's time-range bucketing). For a source that interleaves
across micro-batches, the watermark-buffered adapters
`reorder.reordered_tick_bars` and `reorder.reordered_imbalance_bars`
run the IDENTICAL folds behind the reorder stage, which GUARANTEES
event-time order up to the watermark delay (driver-gated by
`imbalance_ooo_stream_replay`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from data_timeseries_java_spark.streaming.foldutil import whole_batch

BARS_OUT_SCHEMA = ("key string, bar long, n_ticks long, open double, "
                   "high double, low double, close double, "
                   "t_open_ms long, t_close_ms long")
# in-flight partial bar: close price/time are NOT carried — a
# continued bar always recomputes them from the newest batch's last
# row, so carrying them would be write-only state
_STATE_SCHEMA = ("total long, n long, open double, high double, "
                 "low double, t_open_ms long")


def streaming_tick_bars(ticks: DataFrame, bar_size: int = 50,
                        price_col: str = "ask",
                        watermark: str = "0 seconds") -> DataFrame:
    """Per-key streaming fixed-count tick bars. Emits one row per
    COMPLETED bar; the in-flight partial bar lives in state (six
    numbers per key forever — bounded regardless of stream length)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def process(key, pdf_iter, state: GroupState):
        (k,) = key
        if state.exists:
            (total, pn, po, ph, pl, pto) = state.get
        else:
            total, pn = 0, 0
            po = ph = pl = 0.0
            pto = 0
        # Whole-batch concat before the fold (foldutil docs): a key's
        # rows can straddle Arrow chunks out of time order.
        pdf = whole_batch(pdf_iter, "event_time")
        if pdf is not None:
            px = pdf[price_col].astype("float64").to_numpy()
            ts = (pdf["event_time"].astype("int64") // 1_000_000
                  ).to_numpy()
            pos = total + np.arange(len(px))
            bars = pos // bar_size
            out_rows = []
            for b in np.unique(bars):
                m = bars == b
                bpx, bts = px[m], ts[m]
                if pn and b == total // bar_size and total % bar_size:
                    # continue the carried partial bar
                    o, hi = po, max(ph, float(bpx.max()))
                    lo = min(pl, float(bpx.min()))
                    to = pto
                    n = pn + int(m.sum())
                else:
                    o, hi = float(bpx[0]), float(bpx.max())
                    lo, to = float(bpx.min()), int(bts[0])
                    n = int(m.sum())
                c, tc = float(bpx[-1]), int(bts[-1])
                if n == bar_size:
                    out_rows.append((k, int(b), n, o, hi, lo, c, to, tc))
                else:
                    pn, po, ph, pl, pto = n, o, hi, lo, to
            total += len(px)
            if total % bar_size == 0:
                pn = 0
            yield pd.DataFrame(
                out_rows, columns=["key", "bar", "n_ticks", "open",
                                   "high", "low", "close", "t_open_ms",
                                   "t_close_ms"])
        state.update((total, pn, po, ph, pl, pto))

    return (ticks
            .withWatermark("event_time", watermark)
            .groupBy("key")
            .applyInPandasWithState(
                process, BARS_OUT_SCHEMA, _STATE_SCHEMA, "append",
                GroupStateTimeout.NoTimeout))


IMB_OUT_SCHEMA = ("key string, bar long, n_ticks long, n_buy long, "
                  "n_sell long, imbalance long, open double, "
                  "close double, t_open_ms long, t_close_ms long")
_IMB_STATE_SCHEMA = ("bar long, n long, imb long, buy long, sell long, "
                     "open double, t_open_ms long, prev_price double, "
                     "last_dir long")


def imbalance_step(k, px, ts, st, threshold: int):
    """Fold one key's event-time-ASC price/time arrays through the
    imbalance-bar recursion — shared verbatim by
    :func:`streaming_imbalance_bars` and the reorder adapter
    ``reorder.reordered_imbalance_bars``. ``st`` = (bar, n, imb, buy,
    sell, open, t_open_ms, prev_price, last_dir); returns
    (completed-bar row tuples, new st)."""
    import math

    (bar, n, imb, buy, sell, op, to, prev, last) = st
    out = []
    for i in range(len(px)):
        p, t = float(px[i]), int(ts[i])
        if not math.isnan(prev):
            if p > prev:
                last = 1
            elif p < prev:
                last = -1
        prev = p
        if n == 0:
            op, to = p, t
        s = last  # 0 until the key's first price move
        n += 1
        imb += s
        buy += s == 1
        sell += s == -1
        if abs(imb) >= threshold:
            out.append((k, bar, n, buy, sell, imb, op, p, to, t))
            bar += 1
            n = imb = buy = sell = 0
    return out, (bar, n, imb, buy, sell, op, to, prev, last)


def streaming_imbalance_bars(ticks: DataFrame, threshold: int = 7,
                             price_col: str = "ask",
                             watermark: str = "0 seconds") -> DataFrame:
    """Per-key streaming order-flow imbalance bars: the recursive bar
    type as keyed state — (in-flight bar counters, open price/time,
    previous tick price, carried tick-rule direction), nine numbers
    per key forever. A bar is emitted the moment |running imbalance|
    hits the threshold; the in-flight bar stays in state (the same
    completed-bars contract as streaming_tick_bars, and since
    imbalance steps by ±1 a closed bar always has |imbalance| ==
    threshold — which is exactly how the replay gate filters the
    batch oracle)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def process(key, pdf_iter, state: GroupState):
        (k,) = key
        if state.exists:
            st = tuple(state.get)
        else:
            # prev_price NaN = none yet (state schema needs a double)
            st = (0, 0, 0, 0, 0, 0.0, 0, float("nan"), 0)

        # Whole-batch concat before the fold (foldutil docs).
        pdf = whole_batch(pdf_iter, "event_time")
        if pdf is not None:
            px = pdf[price_col].astype("float64").to_numpy()
            ts = (pdf["event_time"].astype("int64") // 1_000_000
                  ).to_numpy()
            out, st = imbalance_step(k, px, ts, st, threshold)
            yield pd.DataFrame(
                out, columns=["key", "bar", "n_ticks", "n_buy",
                              "n_sell", "imbalance", "open", "close",
                              "t_open_ms", "t_close_ms"])
        state.update(st)

    return (ticks
            .withWatermark("event_time", watermark)
            .groupBy("key")
            .applyInPandasWithState(
                process, IMB_OUT_SCHEMA, _IMB_STATE_SCHEMA, "append",
                GroupStateTimeout.NoTimeout))
