"""Watermark-buffered ordered fold: the production front-stage that
removes the fold-family's cross-batch order assumption.

The recursive per-key folds (`ema_stream`, `bars_stream`,
`scd2_stream`) sort WITHIN a micro-batch but require batches to arrive
in per-key time order — true for the replay harness's time-range
bucketing and for an upstream that partitions by key and preserves
producer order, but NOT for a production source that interleaves (a
multi-partition bus where one partition lags). The windowed candle
path handles out-of-order natively via watermarked aggregation; the
folds need this stage.

Mechanism — the same contract as a watermarked window, applied to a
fold: per key, state carries a BUFFER of rows not yet sealed by the
global event-time watermark. Each invocation appends the batch's rows,
folds (in event-time order, through the operator's own recursion)
exactly the prefix with ``ts <= watermark`` — rows the watermark
guarantees can no longer be displaced by in-flight data — and keeps
the rest buffered. An event-time timeout flushes keys that receive no
rows while the watermark advances (e.g. the far-future sentinel batch
of the replay harness, or a key that simply goes quiet).

Contract edges, identical to the candle path's pinned halves:
- a row arriving out of order WITHIN the watermark delay D folds in
  correct event-time order (the EMIT half — pinned by
  ``ema_ooo_stream_replay``);
- a straggler beyond D (ts <= the watermark already folded past) is
  DROPPED, never folded out of order (the DROP half — same policy the
  delay-0 candle gate pins).

State cost: buffer size = rows per key arriving within D of the
watermark front — the fold analogue of the candle path's
keys x ceil(D/resolution) open windows (SCALE.md §late-data), linear
in D and the key's arrival rate, never in stream length. The inner
fold state itself stays O(1) per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def reordered_fold(rows: DataFrame, ts_col: str, payload_cols: list[str],
                   payload_sql_types: list[str], key_col: str,
                   inner_state_schema: str, out_schema: str, fold,
                   watermark: str) -> DataFrame:
    """Generic watermark-buffered fold.

    ``fold(key, ts_ms, payload_arrays, inner_state) ->
    (out_pandas_frame, new_inner_state)`` receives the sealed rows in
    event-time order (``ts_ms`` int64 numpy array, ``payload_arrays``
    dict of numpy arrays keyed by ``payload_cols``) plus the operator's
    own O(1) state tuple (None on the key's first fold), and returns
    the emitted frame (matching ``out_schema``) and the advanced state.
    ``fold`` is never called with zero rows.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from data_timeseries_java_spark.streaming.foldutil import whole_batch

    n_inner = len(inner_state_schema.split(","))
    buf_fields = ", ".join(
        [f"buf_ts array<long>"] +
        [f"buf_{c} array<{t}>"
         for c, t in zip(payload_cols, payload_sql_types)])
    state_schema = f"{buf_fields}, flushed long, {inner_state_schema}"

    def process(key, pdf_iter, state: GroupState):
        (k,) = key
        wm = state.getCurrentWatermarkMs()
        if state.exists:
            tup = state.get
            buf_ts = list(tup[0] or [])
            bufs = {c: list(tup[1 + i] or [])
                    for i, c in enumerate(payload_cols)}
            flushed = tup[1 + len(payload_cols)]
            inner = tuple(tup[2 + len(payload_cols):])
            if all(v is None for v in inner):
                inner = None
        else:
            buf_ts, bufs = [], {c: [] for c in payload_cols}
            flushed, inner = -1, None

        pdf = whole_batch(pdf_iter, ts_col)
        if pdf is not None:
            ts_ms = (pdf[ts_col].astype("int64") // 1_000_000).to_numpy()
            # stragglers beyond D: already folded past — DROP, never
            # fold out of order (the candle path's same drop contract)
            fresh = ts_ms > flushed
            buf_ts.extend(ts_ms[fresh].tolist())
            for c in payload_cols:
                bufs[c].extend(pdf[c].to_numpy()[fresh].tolist())

        out = None
        if buf_ts:
            ts_arr = np.asarray(buf_ts, dtype="int64")
            order = np.argsort(ts_arr, kind="stable")
            sealed = ts_arr[order] <= wm
            if sealed.any():
                ready_idx = order[sealed]
                keep_idx = order[~sealed]
                ready_ts = ts_arr[ready_idx]
                ready_payload = {}
                for c in payload_cols:
                    arr = np.asarray(bufs[c])
                    ready_payload[c] = arr[ready_idx]
                    bufs[c] = arr[keep_idx].tolist()
                buf_ts = ts_arr[keep_idx].tolist()
                out, inner = fold(k, ready_ts, ready_payload, inner)
                flushed = wm

        inner_vals = tuple(inner) if inner is not None \
            else (None,) * n_inner
        state.update((buf_ts,
                      *[bufs[c] for c in payload_cols],
                      flushed, *inner_vals))
        if buf_ts:
            # wake this key when the watermark next advances, even if
            # no new rows arrive for it (must be strictly > current wm)
            state.setTimeoutTimestamp(max(wm + 1, min(buf_ts)))
        if out is not None and len(out):
            yield out

    return (rows
            .withWatermark(ts_col, watermark)
            .groupBy(key_col)
            .applyInPandasWithState(
                process, out_schema, state_schema, "append",
                GroupStateTimeout.EventTimeTimeout))


def reordered_ema(ticks: DataFrame, alpha: float = 0.2,
                  price_col: str = "value",
                  watermark: str = "1 hour") -> DataFrame:
    """The streaming EMA behind the reorder stage: identical recursion
    to ``streaming_ema_applyinpandas`` (pandas ewm(adjust=False)
    continuing the exact IEEE-double fold), but correct under
    out-of-order arrival ACROSS micro-batches up to the watermark
    delay. Input columns: (key, event_time, <price_col>)."""
    import pandas as pd

    def fold(k, ts_ms, payload, inner):
        prev = inner[0] if inner is not None else None
        prices = pd.Series(payload[price_col], dtype="float64")
        if prev is None:
            series, skip = prices, 0
        else:
            series = pd.concat([pd.Series([prev]), prices],
                               ignore_index=True)
            skip = 1
        ema = series.ewm(alpha=alpha, adjust=False).mean().iloc[skip:]
        out = pd.DataFrame({
            "key": k,
            "event_time": pd.to_datetime(ts_ms, unit="ms"),
            "price": prices.to_numpy(),
            "ema": ema.to_numpy(),
        })
        return out, (float(ema.iloc[-1]),)

    return reordered_fold(
        ticks, "event_time", [price_col], ["double"], "key",
        "ema double",
        "key string, event_time timestamp, price double, ema double",
        fold, watermark)


def reordered_tick_bars(ticks: DataFrame, bar_size: int = 50,
                        price_col: str = "ask",
                        watermark: str = "1 hour") -> DataFrame:
    """Count-based tick bars behind the reorder stage — identical bar
    semantics to ``bars_stream.streaming_tick_bars`` (emit completed
    bars, carry the in-flight partial), correct when a key's ticks
    interleave out of order across micro-batches within the watermark
    delay. Input columns: (key, event_time, <price_col>)."""
    import numpy as np
    import pandas as pd

    def fold(k, ts_ms, payload, inner):
        if inner is not None:
            total, pn, po, ph, pl, pto = inner
        else:
            total, pn = 0, 0
            po = ph = pl = 0.0
            pto = 0
        px = np.asarray(payload[price_col], dtype="float64")
        pos = total + np.arange(len(px))
        bars = pos // bar_size
        out_rows = []
        for b in np.unique(bars):
            m = bars == b
            bpx, bts = px[m], ts_ms[m]
            if pn and b == total // bar_size and total % bar_size:
                o, hi = po, max(ph, float(bpx.max()))
                lo, to = min(pl, float(bpx.min())), pto
                n = pn + int(m.sum())
            else:
                o, hi = float(bpx[0]), float(bpx.max())
                lo, to = float(bpx.min()), int(bts[0])
                n = int(m.sum())
            if n == bar_size:
                out_rows.append((k, int(b), n, o, hi, lo,
                                 float(bpx[-1]), to, int(bts[-1])))
            else:
                pn, po, ph, pl, pto = n, o, hi, lo, to
        total += len(px)
        if total % bar_size == 0:
            pn = 0
        out = pd.DataFrame(
            out_rows, columns=["key", "bar", "n_ticks", "open", "high",
                               "low", "close", "t_open_ms",
                               "t_close_ms"])
        return out, (total, pn, po, ph, pl, pto)

    return reordered_fold(
        ticks, "event_time", [price_col], ["double"], "key",
        ("total long, n long, open double, high double, low double, "
         "t_open_ms long"),
        ("key string, bar long, n_ticks long, open double, high double, "
         "low double, close double, t_open_ms long, t_close_ms long"),
        fold, watermark)


def reordered_scd2(events: DataFrame,
                   watermark: str = "1 hour") -> DataFrame:
    """Streaming SCD2 behind the reorder stage — identical version
    semantics to ``scd2_stream.streaming_scd2`` (emit closed versions,
    keep the open one in state), correct when a user's change-log rows
    interleave out of order across micro-batches within the watermark
    delay. Ties on ts break on event_id, the same contract as the
    batch history build. Input columns: (user_id, ts, event_id,
    event_type)."""
    import numpy as np
    import pandas as pd

    def fold(uid, ts_ms, payload, inner):
        attr, vfrom, ver = inner if inner is not None else (None, 0, 0)
        # event_id tie-break WITHIN equal timestamps (ts_ms arrives
        # pre-sorted by the stage; argsort here is stable, so sorting
        # by event_id only within runs of equal ts preserves ts order)
        eid = np.asarray(payload["event_id"], dtype="int64")
        order = np.lexsort((eid, ts_ms))
        types = np.asarray(payload["event_type"], dtype=object)[order]
        ts_sorted = ts_ms[order]
        out = []
        for i in range(len(types)):
            a, t = str(types[i]), int(ts_sorted[i])
            if attr is None:
                attr, vfrom, ver = a, t, 1
            elif a != attr:
                out.append((int(uid), ver, attr, vfrom, t - 1, False))
                attr, vfrom, ver = a, t, ver + 1
        return (pd.DataFrame(
            out, columns=["user_id", "version", "attr", "valid_from_ms",
                          "valid_to_ms", "is_current"]),
            (attr, vfrom, ver))

    return reordered_fold(
        events, "ts", ["event_id", "event_type"], ["long", "string"],
        "user_id", "attr string, valid_from long, version long",
        ("user_id long, version long, attr string, valid_from_ms long, "
         "valid_to_ms long, is_current boolean"),
        fold, watermark)
