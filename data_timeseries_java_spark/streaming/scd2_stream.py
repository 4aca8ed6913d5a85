"""Streaming SCD2 dimension maintenance: the change-log → versioned-
history build (`queries/relational_ext.q_scd2_history`) as keyed
state — a warehouse dimension kept current BY the stream instead of
rebuilt by a nightly batch.

State per user is the OPEN version only — (attribute, valid_from,
version), three scalars forever, regardless of how many changes the
user ever makes. A version row is emitted the moment its successor
arrives (its valid_to becomes the successor's valid_from - 1ms); the
in-flight current version stays in state — the same "completed units
only" contract as streaming_tick_bars (an open bar) and the candle
operator (an unsealed window), and exactly how the replay gate
filters the batch oracle (WHERE NOT is_current).

Order contract (same as ema_stream / bars_stream): rows fold in
(ts, event_id) order within a batch, batches arrive in per-key time
order (the replay harness's time-range bucketing guarantees it, and
equal-ts rows can never straddle buckets). A production source that
interleaves across micro-batches composes the watermark-buffered
reorder stage in front of the fold instead — `streaming/reorder.py`,
whose cross-batch out-of-order contract is pinned by the
`ema_ooo_stream_replay` driver gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

SCD2_OUT_SCHEMA = ("user_id long, version long, attr string, "
                   "valid_from_ms long, valid_to_ms long, "
                   "is_current boolean")
_STATE_SCHEMA = "attr string, valid_from long, version long"


def streaming_scd2(events: DataFrame,
                   watermark: str = "0 seconds") -> DataFrame:
    """Per-user streaming SCD2 over a change log with columns
    (user_id, ts, event_id, event_type). Emits one row per CLOSED
    version; the open current version lives in state."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from data_timeseries_java_spark.streaming.foldutil import whole_batch

    def process(key, pdf_iter, state: GroupState):
        (uid,) = key
        if state.exists:
            attr, vfrom, ver = state.get
        else:
            attr, vfrom, ver = None, 0, 0
        # Whole-batch concat before the sort+fold (foldutil docs): a
        # key's rows can span multiple Arrow chunks, and sorting each
        # chunk independently would fold rows out of (ts, event_id)
        # order across chunk boundaries. Memory = one key's rows per
        # trigger — bounded at change-log grain.
        pdf = whole_batch(pdf_iter, ["ts", "event_id"])
        if pdf is not None:
            ts_ms = (pdf["ts"].astype("int64") // 1_000_000).to_numpy()
            types = pdf["event_type"].to_numpy()
            out = []
            for i in range(len(types)):
                a, t = str(types[i]), int(ts_ms[i])
                if attr is None:
                    attr, vfrom, ver = a, t, 1
                elif a != attr:
                    out.append((int(uid), ver, attr, vfrom, t - 1,
                                False))
                    attr, vfrom, ver = a, t, ver + 1
            yield pd.DataFrame(
                out, columns=["user_id", "version", "attr",
                              "valid_from_ms", "valid_to_ms",
                              "is_current"])
        state.update((attr, vfrom, ver))

    return (events
            .withWatermark("ts", watermark)
            .groupBy("user_id")
            .applyInPandasWithState(
                process, SCD2_OUT_SCHEMA, _STATE_SCHEMA, "append",
                GroupStateTimeout.NoTimeout))
