"""Streaming EMA via transformWithStateInPandas (Spark 4's typed state
API — ValueState instead of the applyInPandasWithState tuple blob).

Demonstrates the modern stateful-processor surface on a genuinely
recursive operator: per key, a ValueState row holds the running EMA;
each micro-batch folds its rows in event-time order and emits the
updated series. Order caveat (inherent to EMA, not the API): rows are
folded in event-time order within a batch, and batches are assumed
ordered per key — the same contract as the candle carry-forward
operator; guard upstream with a watermark.

Environment note: transformWithStateInPandas's driver worker imports
``google.protobuf``; in environments without protobuf the query fails at
initialization (the test suite skips with the cause). The
``applyInPandasWithState`` operators (candles_stream.py) have no such
dependency and are the engine's production stateful path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

EMA_OUT_SCHEMA = "key string, event_time timestamp, price double, ema double"
_STATE_SCHEMA = "ema double"


def streaming_ema(ticks: DataFrame, alpha: float = 0.2,
                  price_col: str = "ask",
                  watermark: str = "0 seconds") -> DataFrame:
    """Per-key streaming EMA over tick prices (ema_0 = first price)."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class EmaProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("ema", _STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            (k,) = key
            prev = self._state.get()[0] if self._state.exists() else None
            out = []
            for pdf in rows:
                pdf = pdf.sort_values("event_time")
                for _, r in pdf.iterrows():
                    x = float(r[price_col])
                    prev = x if prev is None else alpha * x + (1 - alpha) * prev
                    out.append((k, r["event_time"], x, prev))
            if prev is not None:
                self._state.update((prev,))
            yield pd.DataFrame(out, columns=["key", "event_time", "price", "ema"])

        def close(self) -> None:
            pass

    return (ticks
            .withWatermark("event_time", watermark)
            .groupBy("key")
            .transformWithStateInPandas(
                EmaProcessor(), EMA_OUT_SCHEMA, "Append", "EventTime"))


def streaming_ema_applyinpandas(ticks: DataFrame, alpha: float = 0.2,
                                price_col: str = "ask",
                                watermark: str = "0 seconds") -> DataFrame:
    """Same operator on applyInPandasWithState (no protobuf dependency —
    runs in this environment; used by the test suite as the executable
    streaming-EMA path)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def process(key, pdf_iter, state: GroupState):
        (k,) = key
        prev = state.get[0] if state.exists else None
        out = []
        for pdf in pdf_iter:
            pdf = pdf.sort_values("event_time")
            for _, r in pdf.iterrows():
                x = float(r[price_col])
                prev = x if prev is None else alpha * x + (1 - alpha) * prev
                out.append((k, r["event_time"], x, prev))
        if prev is not None:
            state.update((prev,))
        yield pd.DataFrame(out, columns=["key", "event_time", "price", "ema"])

    return (ticks
            .withWatermark("event_time", watermark)
            .groupBy("key")
            .applyInPandasWithState(
                process, EMA_OUT_SCHEMA, _STATE_SCHEMA, "append",
                GroupStateTimeout.NoTimeout))
