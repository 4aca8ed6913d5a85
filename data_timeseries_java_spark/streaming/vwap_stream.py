"""Streaming anchored VWAP: the per-(key, day) running ratio of two
decomposable sums, carried across micro-batches as keyed state.

The batch operator (``operators.bars.anchored_vwap``) is a cumulative
window function over the hourly pre-aggregate; cumulative-within-anchor
is not a watermarked tumbling aggregation, so the streaming variant
carries (anchor, running sum, running volume) per key in
``applyInPandasWithState`` and RESETS the pair when the anchor day
rolls over — the state never exceeds two numbers per key regardless of
stream length, the textbook "bounded keyed state" shape.

Order contract (same as ema_stream): rows are folded in event-time
order within a batch, and batches arrive in per-key time order (the
replay harness's time-range bucketing guarantees it; production gets
it from a watermark + windowed pre-aggregation upstream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

VWAP_OUT_SCHEMA = ("key string, event_time timestamp, anchor_ms long, "
                   "volume long, window_vwap double, "
                   "anchored_vwap double")
_STATE_SCHEMA = "anchor_ms long, run_sum double, run_vol long"

_ANCHOR_MS = 86_400_000


def _round6_half_up(a):
    """Round to 6 decimals half-AWAY-FROM-ZERO — the convention of
    ``F.round`` (java HALF_UP) and DuckDB's ROUND. pandas/numpy
    ``.round`` is half-to-even, which diverges on exact .5 ties; the
    batch lane and oracle both use half-up, so the stream must too
    (fixture prices happen to be 2-decimal-exact and can never tie at
    the 6th decimal, but the operator shouldn't depend on that)."""
    import numpy as np

    return np.copysign(np.floor(np.abs(a) * 1e6 + 0.5), a) / 1e6


def streaming_anchored_vwap(hourly: DataFrame,
                            anchor_ms: int = _ANCHOR_MS,
                            watermark: str = "0 seconds") -> DataFrame:
    """Per-key streaming anchored VWAP over an hourly pre-aggregate
    stream with columns (key, event_time = window start, sum_price,
    volume). Emits one row per input row: the window's own VWAP and
    the running anchored VWAP since the day's first window.

    Running sums are rounded to 6 decimals before the divide —
    the identical FP-noise guard as the batch operator, so
    stream == batch bit-for-bit.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def process(key, pdf_iter, state: GroupState):
        (k,) = key
        if state.exists:
            st_anchor, st_sum, st_vol = state.get
        else:
            st_anchor, st_sum, st_vol = None, 0.0, 0
        for pdf in pdf_iter:
            pdf = pdf.sort_values("event_time")
            ts_ms = (pdf["event_time"].astype("int64") // 1_000_000)
            day = (ts_ms // anchor_ms) * anchor_ms
            cs = pdf.assign(_day=day.to_numpy()).groupby("_day")[
                ["sum_price", "volume"]].cumsum()
            run_sum = cs["sum_price"].to_numpy().copy()
            run_vol = cs["volume"].to_numpy().copy()
            if st_anchor is not None:
                cont = day.to_numpy() == st_anchor
                run_sum[cont] += st_sum
                run_vol[cont] += st_vol
            last_day = int(day.iloc[-1])
            st_anchor = last_day
            tail = day.to_numpy() == last_day
            st_sum = float(run_sum[tail][-1])
            st_vol = int(run_vol[tail][-1])
            vols = pdf["volume"].to_numpy()
            out = pd.DataFrame({
                "key": k,
                "event_time": pdf["event_time"].to_numpy(),
                "anchor_ms": day.to_numpy(),
                "volume": vols,
                "window_vwap": (_round6_half_up(
                    pdf["sum_price"].to_numpy()) / vols),
                "anchored_vwap": _round6_half_up(run_sum) / run_vol,
            })
            yield out
        if st_anchor is not None:
            state.update((st_anchor, st_sum, st_vol))

    return (hourly
            .withWatermark("event_time", watermark)
            .groupBy("key")
            .applyInPandasWithState(
                process, VWAP_OUT_SCHEMA, _STATE_SCHEMA, "append",
                GroupStateTimeout.NoTimeout))
