"""Streaming ordered-funnel tracking: per-user stage state machine
(view → click-after-view → purchase-after-click) over an event stream.

The streaming face of ``queries/relational_ext.q_funnel_conversion``:
keyed state holds each user's funnel cursor — (first view time, first
qualifying click time, first qualifying purchase time) — and each
micro-batch folds its rows in event-time order through the stage
transitions (a click advances the cursor only strictly after the first
view, a purchase only strictly after that click, exactly the batch
query's chained conditional-min semantics).

Ordering contract: the micro-batch is concatenated whole (a key's rows
may straddle Arrow chunks out of order — foldutil docs) and sorted by
event time before folding; ACROSS batches the fold is exact when
batches arrive in event-time order (the replay harness's time-range
bucketing — same contract as the recursive series streams in
``ema_stream.py``). For a source that interleaves a user's events out
of order ACROSS micro-batches, use the watermark-buffered adapter
``streaming/reorder.reordered_funnel`` — the identical stage machine
behind the reorder stage, which GUARANTEES event-time order up to the
watermark delay (driver-gated by ``funnel_ooo_stream_replay``).

Each batch the function emits the user's CURRENT cursor; the resolve
takes the latest batch's row per user (the sink is append-only, so
earlier snapshots are superseded, not wrong).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FUNNEL_OUT_SCHEMA = ("user_id long, t_view long, t_click long, "
                     "t_purchase long")
_STATE_SCHEMA = "v long, c long, p long"


def funnel_step(v, c, p, t_ms, types,
                stages: tuple[str, str, str] = ("view", "click",
                                                "purchase")):
    """Advance one user's funnel cursor over event-time-ASC rows — the
    stage machine shared verbatim by :func:`streaming_funnel` and the
    reorder adapter ``reorder.reordered_funnel`` (a click advances only
    strictly after the first view, a purchase only strictly after that
    click — the batch query's chained conditional-min semantics)."""
    s_view, s_click, s_purchase = stages
    for t, ty in zip(t_ms, types):
        t = int(t)
        if ty == s_view:
            if v is None:
                v = t
        elif ty == s_click:
            if v is not None and c is None and t > v:
                c = t
        elif ty == s_purchase:
            if c is not None and p is None and t > c:
                p = t
    return v, c, p


def streaming_funnel(events: DataFrame,
                     stages: tuple[str, str, str] = ("view", "click",
                                                     "purchase"),
                     user_col: str = "user_id", type_col: str = "event_type",
                     time_col: str = "ts",
                     watermark: str = "0 seconds") -> DataFrame:
    """Per-user funnel cursors as a keyed-state stream; emits one row
    per (user, batch-with-activity) holding the current stage
    timestamps (epoch millis, NULL while a stage is unreached)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def process(key, pdf_iter, state: GroupState):
        from data_timeseries_java_spark.streaming.foldutil import (
            whole_batch,
        )
        (k,) = key
        v, c, p = (state.get if state.exists else (None, None, None))
        # Whole-batch concat before the fold (foldutil docs): the stage
        # machine is order-sensitive, so chunk-wise folding would be
        # wrong when a user's rows straddle chunks out of time order
        pdf = whole_batch(pdf_iter, time_col)
        if pdf is not None:
            t_ms = (pdf[time_col].astype("datetime64[ns]")
                    .astype("int64") // 1_000_000).tolist()
            v, c, p = funnel_step(v, c, p, t_ms,
                                  pdf[type_col].tolist(), stages)
        state.update((v, c, p))
        yield pd.DataFrame({"user_id": [k], "t_view": [v],
                            "t_click": [c], "t_purchase": [p]})

    return (events
            .withWatermark(time_col, watermark)
            .groupBy(user_col)
            .applyInPandasWithState(
                process, FUNNEL_OUT_SCHEMA, _STATE_SCHEMA, "append",
                GroupStateTimeout.NoTimeout))
