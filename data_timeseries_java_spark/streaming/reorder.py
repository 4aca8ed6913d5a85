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
                   watermark: str,
                   state_ttl: str | None = None,
                   max_buffer_rows: int | None = None,
                   on_overflow: str = "spill") -> DataFrame:
    """Generic watermark-buffered fold.

    ``fold(key, ts_ms, payload_arrays, inner_state) ->
    (out_pandas_frame, new_inner_state)`` receives the sealed rows in
    event-time order (``ts_ms`` int64 numpy array, ``payload_arrays``
    dict of numpy arrays keyed by ``payload_cols``) plus the operator's
    own O(1) state tuple (None on the key's first fold), and returns
    the emitted frame (matching ``out_schema``) and the advanced state.
    ``fold`` is never called with zero rows.

    ``state_ttl`` (e.g. ``"30 minutes"``): a key whose buffer has been
    EMPTY for that long of watermark time releases its inner fold
    state entirely — the next arrival re-seeds through the fold's
    ``inner=None`` path, exactly like a first-ever row. For folds
    whose state is a pure smoothing seed (EMA/Holt/Kalman/...) this
    bounds quiet-key state at zero; do NOT set it for folds whose
    state is semantic history (SCD2's open version, an in-flight bar) —
    releasing those changes the answer, not just the memory.

    ``max_buffer_rows`` (round-12 VERDICT #5): the buffer holds, per
    key, the rows within the watermark delay D of the front — rate x D
    rows, which for a HOT key at 100x tick rates is one unbounded
    state value. When set, the guard bounds it explicitly; the policy
    on breach is ``on_overflow``:

    - ``"spill"`` (default): the OLDEST overflow rows are sealed
      through the fold EARLY (before the watermark would have), in
      event-time order, and the drop front advances to the newest
      spilled timestamp — so a straggler older than the spilled front
      is dropped by the standing drop contract. Semantics: a key that
      breaches the cap gets a SHRUNKEN effective reorder tolerance
      (the newest ``max_buffer_rows`` rows' span instead of D); keys
      under the cap are byte-identical to the unguarded fold. The
      pipeline stays alive and memory stays bounded — the right
      posture for a 100 TB keeper pipeline.
    - ``"error"``: raise with the key and buffer size — the loud
      option when early folding would be wrong (audit pipelines where
      a hot key means upstream misconfiguration, not load).
    """
    if on_overflow not in ("spill", "error"):
        raise ValueError(f"on_overflow must be 'spill' or 'error', "
                         f"got {on_overflow!r}")
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from data_timeseries_java_spark.streaming.candles_stream import (
        _resolution_ms,
    )
    from data_timeseries_java_spark.streaming.foldutil import whole_batch

    ttl_ms = _resolution_ms(state_ttl) if state_ttl is not None else None
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

        if max_buffer_rows is not None and len(buf_ts) > max_buffer_rows:
            if on_overflow == "error":
                raise RuntimeError(
                    f"reorder buffer overflow: key {k!r} holds "
                    f"{len(buf_ts)} rows within the watermark delay "
                    f"(max_buffer_rows={max_buffer_rows}); lower the "
                    f"watermark, raise the cap, or use "
                    f"on_overflow='spill'")
            # spill-to-emit: seal the OLDEST overflow early, in event-
            # time order; advance the drop front so stragglers older
            # than the spilled front fall to the standing drop rule
            ts_arr = np.asarray(buf_ts, dtype="int64")
            order = np.argsort(ts_arr, kind="stable")
            spill_idx = order[:len(buf_ts) - max_buffer_rows]
            keep_idx = order[len(buf_ts) - max_buffer_rows:]
            spill_ts = ts_arr[spill_idx]
            spill_payload = {}
            for c in payload_cols:
                arr = np.asarray(bufs[c])
                spill_payload[c] = arr[spill_idx]
                bufs[c] = arr[keep_idx].tolist()
            buf_ts = ts_arr[keep_idx].tolist()
            spilled, inner = fold(k, spill_ts, spill_payload, inner)
            flushed = max(flushed, int(spill_ts.max()))
            out = spilled if out is None else pd.concat(
                [out, spilled], ignore_index=True)

        if not buf_ts and ttl_ms is not None and wm - flushed >= ttl_ms:
            # quiet-key TTL: buffer drained and nothing arrived for
            # ttl of watermark time — release the whole state row; the
            # key's next row re-seeds via the fold's inner=None path
            state.remove()
        else:
            inner_vals = tuple(inner) if inner is not None \
                else (None,) * n_inner
            state.update((buf_ts,
                          *[bufs[c] for c in payload_cols],
                          flushed, *inner_vals))
            if buf_ts:
                # wake this key when the watermark next advances, even
                # if no new rows arrive for it (strictly > current wm)
                state.setTimeoutTimestamp(max(wm + 1, min(buf_ts)))
            elif ttl_ms is not None:
                # quiet key counting down to TTL: wake at the deadline
                # even with no arrivals so the release actually happens
                state.setTimeoutTimestamp(max(wm + 1, flushed + ttl_ms))
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
                  watermark: str = "1 hour",
                  state_ttl: str | None = None,
                  max_buffer_rows: int | None = None,
                  on_overflow: str = "spill") -> DataFrame:
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
        fold, watermark, state_ttl,
        max_buffer_rows=max_buffer_rows, on_overflow=on_overflow)


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


def reordered_series(ticks: DataFrame, spec, price_col: str = "price",
                     watermark: str = "1 hour",
                     state_ttl: str | None = None) -> DataFrame:
    """Any ``ema_stream``-family recursive series fold behind the
    reorder stage: ``spec`` is the (init, step, out_extra,
    state_schema) tuple returned by ``ema_stream.holt_spec`` /
    ``kalman_spec`` / ``garch_spec`` / ``drawdown_spec`` /
    ``macd_spec`` — the IDENTICAL recursion objects the plain fold
    stream runs, so in-order inputs produce bit-identical outputs and
    out-of-order inputs (within the watermark delay) fold in exact
    event-time order."""
    import pandas as pd

    init_state, step, out_extra, inner_schema = spec
    extra_names = [c.split()[0] for c in out_extra.split(", ")]

    def fold(k, ts_ms, payload, inner):
        st = inner
        rows = []
        for z in payload[price_col]:
            if st is None:
                st, extras = init_state(float(z))
            else:
                st, extras = step(st, float(z))
            rows.append(extras)
        out = pd.DataFrame({
            "key": k,
            "event_time": pd.to_datetime(ts_ms, unit="ms"),
            "price": payload[price_col],
        })
        for i, name in enumerate(extra_names):
            out[name] = [r[i] for r in rows]
        return out, st

    out_schema = (f"key string, event_time timestamp, price double, "
                  f"{out_extra}")
    return reordered_fold(
        ticks, "event_time", [price_col], ["double"], "key",
        inner_schema, out_schema, fold, watermark, state_ttl)


def reordered_holt(ticks: DataFrame, alpha: float = 0.25,
                   beta: float = 0.125, price_col: str = "price",
                   watermark: str = "1 hour",
                   state_ttl: str | None = None) -> DataFrame:
    """Holt linear-trend smoothing behind the reorder stage (driver-
    gated by ``holt_ooo_stream_replay`` against the batch RECURSIVE-CTE
    oracle)."""
    from data_timeseries_java_spark.streaming.ema_stream import holt_spec

    return reordered_series(ticks, holt_spec(alpha, beta), price_col,
                            watermark, state_ttl)


def reordered_kalman(ticks: DataFrame, q: float = 0.001, r: float = 0.01,
                     price_col: str = "price",
                     watermark: str = "1 hour",
                     state_ttl: str | None = None) -> DataFrame:
    """1-D Kalman local-level filter behind the reorder stage."""
    from data_timeseries_java_spark.streaming.ema_stream import kalman_spec

    return reordered_series(ticks, kalman_spec(q, r), price_col,
                            watermark, state_ttl)


def reordered_garch(ticks: DataFrame, alpha: float = 0.125,
                    beta: float = 0.75, omega: float = 0.000001,
                    price_col: str = "price",
                    watermark: str = "1 hour",
                    state_ttl: str | None = None) -> DataFrame:
    """GARCH(1,1) filtering behind the reorder stage."""
    from data_timeseries_java_spark.streaming.ema_stream import garch_spec

    return reordered_series(ticks, garch_spec(alpha, beta, omega),
                            price_col, watermark, state_ttl)


def reordered_drawdown(ticks: DataFrame, price_col: str = "price",
                       watermark: str = "1 hour",
                       state_ttl: str | None = None) -> DataFrame:
    """Running-peak drawdown behind the reorder stage."""
    from data_timeseries_java_spark.streaming.ema_stream import (
        drawdown_spec,
    )

    return reordered_series(ticks, drawdown_spec(), price_col,
                            watermark, state_ttl)


def reordered_macd(ticks: DataFrame, span_fast: int = 12,
                   span_slow: int = 26, span_signal: int = 9,
                   price_col: str = "price",
                   watermark: str = "1 hour",
                   state_ttl: str | None = None) -> DataFrame:
    """MACD(fast, slow, signal) behind the reorder stage."""
    from data_timeseries_java_spark.streaming.ema_stream import macd_spec

    return reordered_series(
        ticks, macd_spec(span_fast, span_slow, span_signal), price_col,
        watermark, state_ttl)


def reordered_anchored_vwap(hourly: DataFrame,
                            anchor_ms: int = 86_400_000,
                            watermark: str = "1 hour") -> DataFrame:
    """Streaming anchored VWAP behind the reorder stage — the IDENTICAL
    ``vwap_stream.vwap_fold`` (same cumsum order, same half-up
    rounding), correct when a key's hourly rows interleave out of
    order across micro-batches within the watermark delay. No
    ``state_ttl``: the (anchor, running sums) state is semantic within
    the anchor day; it self-resets on day rollover anyway. Input
    columns: (key, event_time, sum_price, volume). Driver-gated by
    ``vwap_ooo_stream_replay``."""
    import pandas as pd

    from data_timeseries_java_spark.streaming.vwap_stream import vwap_fold

    def fold(k, ts_ms, payload, inner):
        st = tuple(inner) if inner is not None else (None, 0.0, 0)
        cols, st = vwap_fold(ts_ms, payload["sum_price"],
                             payload["volume"], st, anchor_ms)
        out = pd.DataFrame({
            "key": k,
            "event_time": pd.to_datetime(ts_ms, unit="ms"),
            **cols,
        })
        return out, st

    return reordered_fold(
        hourly, "event_time", ["sum_price", "volume"],
        ["double", "long"], "key",
        "anchor_ms long, run_sum double, run_vol long",
        ("key string, event_time timestamp, anchor_ms long, "
         "volume long, window_vwap double, anchored_vwap double"),
        fold, watermark)


def reordered_imbalance_bars(ticks: DataFrame, threshold: int = 7,
                             price_col: str = "ask",
                             watermark: str = "1 hour") -> DataFrame:
    """Order-flow imbalance bars behind the reorder stage — the
    IDENTICAL ``bars_stream.imbalance_step`` recursion, correct when a
    key's ticks interleave out of order across micro-batches within
    the watermark delay. No ``state_ttl``: the in-flight partial bar
    is semantic — releasing it would re-open a bar mid-count. Driver-
    gated by ``imbalance_ooo_stream_replay``."""
    import pandas as pd

    from data_timeseries_java_spark.streaming.bars_stream import (
        imbalance_step,
    )

    def fold(k, ts_ms, payload, inner):
        st = tuple(inner) if inner is not None \
            else (0, 0, 0, 0, 0, 0.0, 0, float("nan"), 0)
        out, st = imbalance_step(k, payload[price_col], ts_ms, st,
                                 threshold)
        return (pd.DataFrame(
            out, columns=["key", "bar", "n_ticks", "n_buy", "n_sell",
                          "imbalance", "open", "close", "t_open_ms",
                          "t_close_ms"]), st)

    return reordered_fold(
        ticks, "event_time", [price_col], ["double"], "key",
        ("bar long, n long, imb long, buy long, sell long, "
         "open double, t_open_ms long, prev_price double, "
         "last_dir long"),
        ("key string, bar long, n_ticks long, n_buy long, n_sell long, "
         "imbalance long, open double, close double, t_open_ms long, "
         "t_close_ms long"),
        fold, watermark)


def reordered_funnel(events: DataFrame,
                     stages: tuple[str, str, str] = ("view", "click",
                                                     "purchase"),
                     watermark: str = "1 hour") -> DataFrame:
    """Ordered-funnel stage machine behind the reorder stage — the
    IDENTICAL ``funnel_stream.funnel_step`` transitions, correct when a
    user's events interleave out of order across micro-batches within
    the watermark delay (the stage machine is order-sensitive: a click
    only counts strictly after the first view, so displacement without
    reordering would silently lose conversions). Emits the user's
    cursor after each fold with the fold's watermark frontier
    (``asof_ms``) so the resolve can take the latest snapshot per user.
    No ``state_ttl``: the cursor is semantic history. Input columns:
    (user_id, ts, event_type). Driver-gated by
    ``funnel_ooo_stream_replay``."""
    import pandas as pd

    from data_timeseries_java_spark.streaming.funnel_stream import (
        funnel_step,
    )

    def fold(uid, ts_ms, payload, inner):
        v, c, p = tuple(inner) if inner is not None else (None, None,
                                                          None)
        v, c, p = funnel_step(v, c, p, ts_ms,
                              list(payload["event_type"]), stages)
        out = pd.DataFrame({"user_id": [int(uid)], "t_view": [v],
                            "t_click": [c], "t_purchase": [p],
                            "asof_ms": [int(ts_ms[-1])]})
        return out, (v, c, p)

    return reordered_fold(
        events, "ts", ["event_type"], ["string"], "user_id",
        "v long, c long, p long",
        ("user_id long, t_view long, t_click long, t_purchase long, "
         "asof_ms long"),
        fold, watermark)
