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
order within a batch (whole-batch concat + sort — a key's rows may
straddle Arrow chunks out of order, foldutil docs), and batches arrive
in per-key time order. For a source that interleaves a key's rows out
of order ACROSS micro-batches, use the watermark-buffered adapter
``streaming/reorder.reordered_anchored_vwap`` — the identical fold
behind the reorder stage, which GUARANTEES event-time order up to the
watermark delay (driver-gated by ``vwap_ooo_stream_replay``).
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


def vwap_fold(ts_ms, sum_price, volume, st, anchor_ms: int = _ANCHOR_MS):
    """One anchored-VWAP fold step over event-time-ASC numpy arrays —
    shared verbatim by :func:`streaming_anchored_vwap` and the reorder
    adapter ``reorder.reordered_anchored_vwap`` so both paths run the
    identical FP operations (cumsum order, half-up rounding, divide).

    ``st`` = (anchor_ms | None, run_sum, run_vol); returns
    (output column dict sans key/event_time, new st)."""
    import pandas as pd

    st_anchor, st_sum, st_vol = st
    day = (ts_ms // anchor_ms) * anchor_ms
    cs = (pd.DataFrame({"_day": day, "sum_price": sum_price,
                        "volume": volume})
          .groupby("_day")[["sum_price", "volume"]].cumsum())
    run_sum = cs["sum_price"].to_numpy().copy()
    run_vol = cs["volume"].to_numpy().copy()
    if st_anchor is not None:
        cont = day == st_anchor
        run_sum[cont] += st_sum
        run_vol[cont] += st_vol
    last_day = int(day[-1])
    tail = day == last_day
    new_st = (last_day, float(run_sum[tail][-1]), int(run_vol[tail][-1]))
    cols = {
        "anchor_ms": day,
        "volume": volume,
        "window_vwap": _round6_half_up(sum_price) / volume,
        "anchored_vwap": _round6_half_up(run_sum) / run_vol,
    }
    return cols, new_st


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
        from data_timeseries_java_spark.streaming.foldutil import (
            whole_batch,
        )
        (k,) = key
        st = state.get if state.exists else (None, 0.0, 0)
        # Whole-batch concat before the fold (foldutil docs): the
        # anchored cumsum is order-sensitive, so chunk-wise folding
        # would be wrong when a key's rows straddle chunks out of order
        pdf = whole_batch(pdf_iter, "event_time")
        if pdf is not None:
            ts_ms = (pdf["event_time"].astype("int64")
                     // 1_000_000).to_numpy()
            cols, st = vwap_fold(ts_ms, pdf["sum_price"].to_numpy(),
                                 pdf["volume"].to_numpy(), st, anchor_ms)
            yield pd.DataFrame({
                "key": k,
                "event_time": pdf["event_time"].to_numpy(),
                **cols,
            })
        if st[0] is not None:
            state.update(tuple(st))

    return (hourly
            .withWatermark("event_time", watermark)
            .groupBy("key")
            .applyInPandasWithState(
                process, VWAP_OUT_SCHEMA, _STATE_SCHEMA, "append",
                GroupStateTimeout.NoTimeout))
