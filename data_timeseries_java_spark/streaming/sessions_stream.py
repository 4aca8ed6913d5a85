"""Streaming sessionization: gap-based session windows over a keyed
event stream.

The streaming face of `queries/relational.q_user_sessions` (the batch
lag/cumsum idiom), built on Spark's native ``session_window``: a
session extends while successive events arrive within ``gap`` of the
previous one, the window closes at last_event + gap, and append mode
emits a session only once the watermark passes its close — so state per
key is bounded by the watermark horizon, not the stream length. The
same ``session_window`` expression runs identically in batch, which is
what the equivalence test pins.

Note the boundary semantics: ``session_window`` starts a NEW session
when the inter-event gap is >= ``gap``, while the batch lag/cumsum
query splits only when it is > ``gap``. Events landing exactly on the
boundary differ; both faces document it and the tests use
boundary-free fixtures plus the shared-expression batch run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize(events: DataFrame, key_col: str = "user_id",
               time_col: str = "ts", gap: str = "30 minutes",
               value_col: str = "value") -> DataFrame:
    """The shared session aggregation — works on a batch OR streaming
    frame (callers add the watermark for streaming)."""
    return (events
            .groupBy(F.col(key_col),
                     F.session_window(F.col(time_col), gap))
            .agg(F.unix_millis(F.min(time_col)).alias("session_start_ms"),
                 F.unix_millis(F.max(time_col)).alias("session_last_ms"),
                 F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum(value_col), 6).alias("session_value"))
            .select(key_col, "session_start_ms", "session_last_ms",
                    "n_events", "session_value"))


def streaming_sessions(events: DataFrame, key_col: str = "user_id",
                       time_col: str = "ts", gap: str = "30 minutes",
                       value_col: str = "value",
                       watermark: str = "1 hour") -> DataFrame:
    """Sessionize a stream: sessions close at last_event + gap and are
    emitted (append mode) once the watermark passes the close; session
    state for a key is merged across micro-batches by Spark's session
    window state store and evicted on emit."""
    return sessionize(events.withWatermark(time_col, watermark),
                      key_col, time_col, gap, value_col)
