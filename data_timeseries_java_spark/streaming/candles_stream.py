"""Streaming OHLC candles: watermarked window agg, and a keyed stateful
operator for complete (gap-filled, carry-forward) candles.

Streaming equivalents of ``operators/candles.py`` (W1+A3 / A1+A2+A4 /
W3, SURVEY.md §2.2-2.3):

- :func:`streaming_ohlc_candles` — watermarked fixed-window aggregation,
  identical aggregation expressions to the batch operator; Spark runs
  the same logical plan incrementally against a state store. The
  watermark replaces the reference's no-late-data stance with an
  explicit policy: rows later than the watermark are dropped; candles
  finalize (append mode) once the watermark passes window end.

- :func:`streaming_complete_candles` — ONE ``applyInPandasWithState``
  operator over raw ticks that owns the whole candle lifecycle per
  instrument: partial-candle accumulation for open windows, window
  finalization at the watermark, interior gap-window synthesis, and
  carry-forward close→open. Spark disallows a second stateful operator
  after a streaming aggregation in append mode, and the reference's
  accumulating-panes trick (``CompleteTimeSeriesAggCombiner.java:47-227``)
  is precisely "keyed state across windows" — so the state store is the
  honest home for all of it. State per key: the open windows' partial
  candles + the last emitted close; O(keys x open windows), a few
  hundred bytes per instrument.

Semantics notes (documented divergences, all test-asserted):
- Gap candles are synthesized for INTERIOR missing windows of each key
  (between two windows where the key ticked). The batch operator also
  emits leading/trailing gap rows when OTHER instruments ticked (its
  missing-key detection is global per window); a per-key streaming
  operator cannot see other keys without another shuffle. For streams
  where every instrument is live in the first and last window (the
  demo fixture; any dense feed) the outputs are identical.
- min/max in the flat streaming output carry prices only (the batch
  operator keeps whole ticks; the flat schema is what sinks want).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CANDLE_OUT_SCHEMA = (
    "key string, window_start timestamp, window_end timestamp, "
    "open_time timestamp, open_bid double, open_ask double, "
    "close_time timestamp, close_bid double, close_ask double, "
    "min_ask double, max_ask double, min_bid double, max_bid double, "
    "is_live boolean"
)

# per-key state: carry-forward cursor + parallel arrays of open-window
# partial candles (flat struct — GroupState cannot hold maps)
STATE_SCHEMA = (
    "next_w long, last_time long, last_bid double, last_ask double, "
    "w_starts array<long>, cl_t array<long>, "
    "cl_bid array<double>, cl_ask array<double>, "
    "mn_ask array<double>, mx_ask array<double>, "
    "mn_bid array<double>, mx_bid array<double>"
)


def streaming_ohlc_candles(ticks: DataFrame, resolution: str = "120 seconds",
                           watermark: str = "0 seconds") -> DataFrame:
    """Watermarked fixed-window OHLC aggregation (streaming W1+A3)."""
    t_ms = F.unix_millis(F.col("event_time"))
    tick = F.struct(
        F.col("event_time").alias("time"),
        F.col("bid"), F.col("ask"), F.col("is_live"),
    )
    df = (ticks
          .withWatermark("event_time", watermark)
          .select("key", F.window("event_time", resolution).alias("w"),
                  tick.alias("tick"), "bid", "ask", "is_live",
                  t_ms.alias("t_ms")))
    agg = df.groupBy("key", "w").agg(
        F.min(F.struct(F.col("ask"), F.col("t_ms"), F.col("tick"))).alias("mna"),
        F.max(F.struct(F.col("ask"), (-F.col("t_ms")).alias("n"), F.col("tick"))).alias("mxa"),
        F.min(F.struct(F.col("bid"), F.col("t_ms"), F.col("tick"))).alias("mnb"),
        F.max(F.struct(F.col("bid"), (-F.col("t_ms")).alias("n"), F.col("tick"))).alias("mxb"),
        F.max(F.struct(F.col("t_ms"), F.col("is_live").cast("int").alias("l"),
                       F.col("tick"))).alias("cl"),
        F.max("is_live").alias("is_live"),
    )
    return agg.select(
        "key",
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        F.col("cl.tick").alias("close"),
        F.col("mna.tick").alias("min_ask"),
        F.col("mxa.tick").alias("max_ask"),
        F.col("mnb.tick").alias("min_bid"),
        F.col("mxb.tick").alias("max_bid"),
        "is_live",
    )


def _resolution_ms(resolution: str) -> int:
    qty, unit = resolution.split()
    mult = {"second": 1000, "seconds": 1000, "minute": 60_000,
            "minutes": 60_000, "hour": 3_600_000, "hours": 3_600_000}[unit]
    return int(qty) * mult


def streaming_complete_candles(ticks: DataFrame,
                               resolution: str = "120 seconds",
                               watermark: str = "0 seconds") -> DataFrame:
    """Complete candles (gap-filled interior windows + carry-forward) as a
    single keyed stateful operator over raw ticks."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    res_ms = _resolution_ms(resolution)

    def process(key, pdf_iter, state: GroupState):
        (k,) = key
        if state.exists:
            (next_w, last_time, last_bid, last_ask,
             w_starts, cl_t, cl_bid, cl_ask,
             mn_ask, mx_ask, mn_bid, mx_bid) = state.get
            open_w = {
                w: [cl_t[i], cl_bid[i], cl_ask[i], mn_ask[i], mx_ask[i],
                    mn_bid[i], mx_bid[i]]
                for i, w in enumerate(w_starts)
            }
        else:
            next_w = last_time = last_bid = last_ask = None
            open_w = {}

        # 1. fold this batch's ticks into open-window partial candles
        for pdf in pdf_iter:
            t_ms = (pdf["event_time"].astype("datetime64[ns]").astype("int64")
                    // 1_000_000).to_numpy()
            bids = pdf["bid"].to_numpy()
            asks = pdf["ask"].to_numpy()
            for i in range(len(pdf)):
                w = int(t_ms[i]) // res_ms * res_ms
                c = open_w.get(w)
                if c is None:
                    open_w[w] = [int(t_ms[i]), float(bids[i]), float(asks[i]),
                                 float(asks[i]), float(asks[i]),
                                 float(bids[i]), float(bids[i])]
                else:
                    if t_ms[i] > c[0]:
                        c[0], c[1], c[2] = int(t_ms[i]), float(bids[i]), float(asks[i])
                    c[3] = min(c[3], float(asks[i]))
                    c[4] = max(c[4], float(asks[i]))
                    c[5] = min(c[5], float(bids[i]))
                    c[6] = max(c[6], float(bids[i]))

        # 2. finalize windows passed by the watermark, oldest first,
        #    synthesizing interior gap candles for skipped windows
        wm = state.getCurrentWatermarkMs()
        out = []

        def emit(w, ct, cb, ca, mna, mxa, mnb, mxb, live):
            nonlocal next_w, last_time, last_bid, last_ask
            if last_time is not None:
                ot, ob, oa = last_time, last_bid, last_ask
            else:
                ot, ob, oa = ct, cb, ca
            out.append((k, w, w + res_ms, ot, ob, oa, ct, cb, ca,
                        mna, mxa, mnb, mxb, live))
            next_w = w + res_ms
            last_time, last_bid, last_ask = ct, cb, ca

        for w in sorted(open_w):
            if w + res_ms > wm:
                break
            # interior gaps since the previous emitted window
            if next_w is not None:
                g = next_w
                while g < w:
                    if last_time is not None:
                        gt = g + res_ms - 1
                        emit(g, gt, last_bid, last_ask,
                             last_ask, last_ask, last_bid, last_bid, False)
                    g += res_ms
            c = open_w.pop(w)
            emit(w, c[0], c[1], c[2], c[3], c[4], c[5], c[6], True)

        # 3. persist remaining open windows + cursor; arm an event-time
        #    timeout at the oldest open window's end so the no-data final
        #    micro-batch (or any later watermark advance without rows for
        #    this key) re-invokes us to flush
        ws = sorted(open_w)
        state.update((
            next_w, last_time, last_bid, last_ask,
            ws,
            [open_w[w][0] for w in ws],
            [open_w[w][1] for w in ws],
            [open_w[w][2] for w in ws],
            [open_w[w][3] for w in ws],
            [open_w[w][4] for w in ws],
            [open_w[w][5] for w in ws],
            [open_w[w][6] for w in ws],
        ))
        if ws:
            state.setTimeoutTimestamp(ws[0] + res_ms)

        cols = ["key", "window_start", "window_end",
                "open_time", "open_bid", "open_ask",
                "close_time", "close_bid", "close_ask",
                "min_ask", "max_ask", "min_bid", "max_bid", "is_live"]
        pdf = pd.DataFrame(out, columns=cols)
        for c in ("window_start", "window_end", "open_time", "close_time"):
            pdf[c] = pd.to_datetime(pdf[c], unit="ms", utc=True).dt.tz_localize(None)
        yield pdf

    return (ticks
            .withWatermark("event_time", watermark)
            .groupBy("key")
            .applyInPandasWithState(
                process, CANDLE_OUT_SCHEMA, STATE_SCHEMA, "append",
                GroupStateTimeout.EventTimeTimeout))
