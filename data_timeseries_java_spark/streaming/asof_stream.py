"""Streaming as-of join: enrich each left-stream row with the latest
right-stream row at-or-before its event time, per key — trade-vs-quote
matching / point-in-time feature lookup over two live streams.

Spark has no streaming ASOF JOIN primitive (the batch rewrite in
``operators/temporal.asof_join`` — union + last-value window — needs a
total order per key, which an unbounded stream never has). The streaming
formulation here is the keyed-state one: union the two tagged streams,
group by key, and let ``applyInPandasWithState`` hold exactly the rows
the watermark has not yet sealed:

- left rows with ``t > watermark`` wait in state (a right row at-or-
  before them may still arrive);
- right rows with ``t > watermark`` wait in state (a late left row may
  need them);
- of the right rows at-or-before the watermark only the LATEST is kept:
  every future left row has ``t > watermark``, so older rights can never
  win again.  State is O(in-flight rows per key) + 1, not O(history).

Emission is watermark-driven (append mode): a left row is resolved and
emitted the moment the watermark passes its event time, seeing every
right row at-or-before it regardless of arrival order. Inner semantics
match the batch operator: left rows with no prior right row are dropped.
An event-time timeout re-invokes the function when the watermark moves
without new rows for the key, so tail rows flush.

Reference parity note: the reference repo joins live against generated
candles inside one pipeline (`FXTimeSeriesPipelineDemo.java`) and has no
two-stream as-of; this operator serves the engine's general time-series
brief. Stream==batch equivalence vs ``asof_join`` is the test contract
(``tests/test_streaming_asof.py``).
"""

from __future__ import annotations

from bisect import bisect_right

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_asof_join(left: DataFrame, right: DataFrame, on: str = "key",
                        left_time: str = "event_time",
                        right_time: str = "event_time",
                        right_cols: list[str] | None = None,
                        suffix: str = "_asof",
                        watermark: str = "0 seconds",
                        tolerance: str | None = None) -> DataFrame:
    """Keyed streaming as-of join (inner, ``right_time <= left_time``).

    ``left`` / ``right`` are streaming DataFrames sharing the key column
    ``on``. Payload columns must be atomic non-timestamp types (they
    ride through keyed state); the matched right row's timestamp is
    returned as ``right_time + suffix``. Output schema = left columns +
    suffixed right value columns, exactly like the batch operator.
    ``tolerance`` (e.g. ``"5 minutes"``) drops matches older than
    ``left_time - tolerance`` — same stale-quote guard as the batch
    operator's ``tolerance=``."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from data_timeseries_java_spark.streaming.candles_stream import (
        _resolution_ms,
    )

    tol_us = (_resolution_ms(tolerance) * 1000
              if tolerance is not None else None)

    lcols = [c for c in left.columns if c not in (on, left_time)]
    rcols = right_cols if right_cols is not None else \
        [c for c in right.columns if c not in (on, right_time)]
    ltypes = {f.name: f.dataType.simpleString() for f in left.schema.fields}
    rtypes = {f.name: f.dataType.simpleString() for f in right.schema.fields}

    l_tagged = left.select(
        F.col(on).alias("_k"), F.col(left_time).alias("_et"),
        F.lit(1).alias("_side"),
        *[F.col(c).alias(f"_l_{c}") for c in lcols],
        *[F.lit(None).cast(rtypes[c]).alias(f"_r_{c}") for c in rcols])
    r_tagged = right.select(
        F.col(on).alias("_k"), F.col(right_time).alias("_et"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(ltypes[c]).alias(f"_l_{c}") for c in lcols],
        *[F.col(c).alias(f"_r_{c}") for c in rcols])
    u = l_tagged.unionByName(r_tagged).withWatermark("_et", watermark)

    out_schema = ", ".join(
        [f"`{on}` {ltypes[on]}", f"`{left_time}` timestamp"]
        + [f"`{c}` {ltypes[c]}" for c in lcols]
        + [f"`{c}{suffix}` {rtypes[c]}" for c in rcols]
        + [f"`{right_time}{suffix}` timestamp"])
    # Leading version field: the ms→µs timestamp migration kept the
    # array<long> shape, so a checkpoint written by the old ms-based
    # code would otherwise RESUME cleanly with its stored ms values
    # reinterpreted as µs (pending rows ~1000× older than the
    # watermark, silently wrong joins). Changing the state tuple's
    # SHAPE makes pre-upgrade checkpoints fail loudly at deserialize /
    # the explicit version check below instead.
    state_schema = ", ".join(
        ["v int", "l_ts array<long>", "r_ts array<long>"]
        + [f"l_{i} array<{ltypes[c]}>" for i, c in enumerate(lcols)]
        + [f"r_{i} array<{rtypes[c]}>" for i, c in enumerate(rcols)])
    out_cols = ([on, left_time] + lcols
                + [c + suffix for c in rcols] + [right_time + suffix])

    def _caster(ddl: str):
        # a micro-batch mixing sides makes pandas upcast the other
        # side's null-padded numeric columns to float64 — cast stored
        # values back so they match the declared state/output types
        if ddl in ("bigint", "int", "smallint", "tinyint"):
            return lambda v: int(v)
        if ddl in ("double", "float"):
            return lambda v: float(v)
        if ddl == "boolean":
            return lambda v: bool(v)
        return lambda v: v

    l_cast = [_caster(ltypes[c]) for c in lcols]
    r_cast = [_caster(rtypes[c]) for c in rcols]

    _STATE_VERSION = 2            # 2 = µs timestamps (1 was ms)

    def process(key, pdf_iter, state: GroupState):
        (k,) = key
        if state.exists:
            st = state.get
            if st[0] != _STATE_VERSION:
                raise ValueError(
                    f"streaming as-of state version {st[0]} != "
                    f"{_STATE_VERSION}; refusing to resume a checkpoint "
                    f"written by an incompatible timestamp encoding")
            l_ts = list(st[1])
            r_ts = list(st[2])
            l_vals = [list(a) for a in st[3:3 + len(lcols)]]
            r_vals = [list(a) for a in st[3 + len(lcols):]]
        else:
            l_ts, r_ts = [], []
            l_vals = [[] for _ in lcols]
            r_vals = [[] for _ in rcols]

        for pdf in pdf_iter:
            # MICROsecond event times: parquet/Spark timestamps are µs
            # precision, so the join order matches the batch operator
            # exactly (an earlier ms truncation made sub-ms pairs tie
            # here that full-precision engines order — a latent
            # data-dependent divergence)
            t_us = (pdf["_et"].astype("datetime64[ns]").astype("int64")
                    // 1_000).tolist()
            side = pdf["_side"].tolist()
            lp = [pdf[f"_l_{c}"].tolist() for c in lcols]
            rp = [pdf[f"_r_{c}"].tolist() for c in rcols]
            for i in range(len(pdf)):
                if side[i]:
                    l_ts.append(t_us[i])
                    for j in range(len(lcols)):
                        l_vals[j].append(l_cast[j](lp[j][i]))
                else:
                    r_ts.append(t_us[i])
                    for j in range(len(rcols)):
                        r_vals[j].append(r_cast[j](rp[j][i]))

        # sort both sides by event time (stable: state rows, which
        # arrived in earlier batches, keep precedence at equal times)
        if r_ts:
            order = sorted(range(len(r_ts)), key=r_ts.__getitem__)
            r_ts = [r_ts[i] for i in order]
            r_vals = [[v[i] for i in order] for v in r_vals]
        if l_ts:
            order = sorted(range(len(l_ts)), key=l_ts.__getitem__)
            l_ts = [l_ts[i] for i in order]
            l_vals = [[v[i] for i in order] for v in l_vals]

        wm = state.getCurrentWatermarkMs() * 1000   # state times are µs
        out = []
        n_emit = bisect_right(l_ts, wm)
        for i in range(n_emit):
            t = l_ts[i]
            ri = bisect_right(r_ts, t) - 1     # latest right with t_r <= t
            if ri < 0:
                continue                        # inner: no prior right row
            if tol_us is not None and r_ts[ri] < t - tol_us:
                continue                        # match too stale
            out.append((k, t, *[v[i] for v in l_vals],
                        *[v[ri] for v in r_vals], r_ts[ri]))

        # retain lefts the watermark hasn't sealed, rights > wm plus the
        # single latest right <= wm (older ones can never win again)
        l_ts = l_ts[n_emit:]
        l_vals = [v[n_emit:] for v in l_vals]
        keep_from = max(bisect_right(r_ts, wm) - 1, 0)
        r_ts = r_ts[keep_from:]
        r_vals = [v[keep_from:] for v in r_vals]

        state.update((_STATE_VERSION, l_ts, r_ts, *l_vals, *r_vals))
        if l_ts:
            # flush when the watermark passes the oldest pending left
            # (timeout API is ms; round µs up so the timeout never
            # fires a hair before the row is actually sealed)
            state.setTimeoutTimestamp(-(-l_ts[0] // 1000))

        pdf = pd.DataFrame(out, columns=["_k", "_lt"]
                           + [f"_l_{c}" for c in lcols]
                           + [f"_r_{c}" for c in rcols] + ["_rt"])
        for c in ("_lt", "_rt"):
            pdf[c] = pd.to_datetime(
                pdf[c], unit="us", utc=True).dt.tz_localize(None)
        pdf.columns = out_cols
        yield pdf

    return (u.groupBy("_k")
            .applyInPandasWithState(
                process, out_schema, state_schema, "append",
                GroupStateTimeout.EventTimeTimeout))


def streaming_asof_join_bucketed(left: DataFrame, right: DataFrame,
                                 on: str = "key",
                                 left_time: str = "event_time",
                                 right_time: str = "event_time",
                                 right_cols: list[str] | None = None,
                                 suffix: str = "_asof",
                                 watermark: str = "0 seconds",
                                 tolerance: str | None = None,
                                 n_buckets: int = 64) -> DataFrame:
    """Wide-key variant of :func:`streaming_asof_join`: state is keyed
    by ``hash(key) % n_buckets`` instead of the key itself, and each
    bucket resolves ALL its keys in one vectorized ``pd.merge_asof``
    (grouped C-path) per trigger.

    Why: ``applyInPandasWithState`` dispatches one Python call per
    state key per trigger — at 10k instrument keys that is 10k
    dispatches of a few-row pandas frame each, and dispatch overhead
    dominates (~4,700 rows/s measured, SCALE.md "Streaming state").
    Coarsening to ``n_buckets`` state keys cuts dispatches ~keys/
    buckets-fold while per-bucket work stays a single sorted
    merge_asof over ~keys/buckets series. Same emission contract as
    the per-key operator: watermark-sealed lefts, latest right at-or-
    before per key, inner, optional staleness ``tolerance``; state
    per bucket = unsealed rows + one sealed right per key (still
    O(total keys) overall).

    Trade-off vs per-key state: a bucket's state is rewritten when ANY
    of its keys changes, so pick ``n_buckets`` ~ sqrt(active keys) x
    a few — large enough that buckets fit comfortably in an Arrow
    batch, small enough that dispatch count stays trivial."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from data_timeseries_java_spark.streaming.candles_stream import (
        _resolution_ms,
    )

    tol_us = (_resolution_ms(tolerance) * 1000
              if tolerance is not None else None)

    lcols = [c for c in left.columns if c not in (on, left_time)]
    rcols = right_cols if right_cols is not None else \
        [c for c in right.columns if c not in (on, right_time)]
    ltypes = {f.name: f.dataType.simpleString() for f in left.schema.fields}
    rtypes = {f.name: f.dataType.simpleString() for f in right.schema.fields}

    bucket = F.pmod(F.hash(F.col(on)), F.lit(n_buckets))
    l_tagged = left.select(
        bucket.alias("_b"), F.col(on).alias("_k"),
        F.col(left_time).alias("_et"), F.lit(1).alias("_side"),
        *[F.col(c).alias(f"_l_{c}") for c in lcols],
        *[F.lit(None).cast(rtypes[c]).alias(f"_r_{c}") for c in rcols])
    r_tagged = right.select(
        bucket.alias("_b"), F.col(on).alias("_k"),
        F.col(right_time).alias("_et"), F.lit(0).alias("_side"),
        *[F.lit(None).cast(ltypes[c]).alias(f"_l_{c}") for c in lcols],
        *[F.col(c).alias(f"_r_{c}") for c in rcols])
    u = l_tagged.unionByName(r_tagged).withWatermark("_et", watermark)

    out_schema = ", ".join(
        [f"`{on}` {ltypes[on]}", f"`{left_time}` timestamp"]
        + [f"`{c}` {ltypes[c]}" for c in lcols]
        + [f"`{c}{suffix}` {rtypes[c]}" for c in rcols]
        + [f"`{right_time}{suffix}` timestamp"])
    state_schema = ", ".join(
        ["v int",
         f"l_k array<{ltypes[on]}>", "l_ts array<long>",
         f"r_k array<{ltypes[on]}>", "r_ts array<long>"]
        + [f"l_{i} array<{ltypes[c]}>" for i, c in enumerate(lcols)]
        + [f"r_{i} array<{rtypes[c]}>" for i, c in enumerate(rcols)])
    out_cols = ([on, left_time] + lcols
                + [c + suffix for c in rcols] + [right_time + suffix])

    def _np_cast(ddl: str):
        if ddl in ("bigint", "int", "smallint", "tinyint"):
            return "int64"
        if ddl in ("double", "float"):
            return "float64"
        if ddl == "boolean":
            return "bool"
        return None                       # strings/objects pass through

    l_cast = [_np_cast(ltypes[c]) for c in lcols]
    r_cast = [_np_cast(rtypes[c]) for c in rcols]

    _STATE_VERSION = 1

    def process(key, pdf_iter, state: GroupState):
        if state.exists:
            st = state.get
            if st[0] != _STATE_VERSION:
                raise ValueError(
                    f"bucketed as-of state version {st[0]} != "
                    f"{_STATE_VERSION}; refusing to resume an "
                    f"incompatible checkpoint")
            Lk, Lts = list(st[1]), list(st[2])
            Rk, Rts = list(st[3]), list(st[4])
            Lv = [list(a) for a in st[5:5 + len(lcols)]]
            Rv = [list(a) for a in st[5 + len(lcols):]]
        else:
            Lk, Lts, Rk, Rts = [], [], [], []
            Lv = [[] for _ in lcols]
            Rv = [[] for _ in rcols]

        for pdf in pdf_iter:
            # µs event times — same precision contract as the per-key
            # operator (sub-ms ties must order identically to batch)
            t_us = (pdf["_et"].astype("datetime64[ns]").astype("int64")
                    // 1_000)
            is_l = pdf["_side"].values == 1
            Lk.extend(pdf["_k"].values[is_l].tolist())
            Lts.extend(t_us.values[is_l].tolist())
            Rk.extend(pdf["_k"].values[~is_l].tolist())
            Rts.extend(t_us.values[~is_l].tolist())
            for j, c in enumerate(lcols):
                col = pdf[f"_l_{c}"].values[is_l]
                if l_cast[j] is not None:   # undo mixed-batch upcast
                    col = col.astype(l_cast[j])
                Lv[j].extend(col.tolist())
            for j, c in enumerate(rcols):
                col = pdf[f"_r_{c}"].values[~is_l]
                if r_cast[j] is not None:
                    col = col.astype(r_cast[j])
                Rv[j].extend(col.tolist())

        # state lists precede batch rows, and stable sorts keep that
        # order at equal timestamps — earlier arrivals win ties exactly
        # like the per-key operator's stable sort
        L = pd.DataFrame({"k": Lk, "t": np.asarray(Lts, dtype="int64"),
                          **{f"l_{c}": Lv[j]
                             for j, c in enumerate(lcols)}})
        R = pd.DataFrame({"k": Rk, "t": np.asarray(Rts, dtype="int64"),
                          **{f"r_{c}": Rv[j]
                             for j, c in enumerate(rcols)}})
        L = L.sort_values("t", kind="stable", ignore_index=True)
        R = R.sort_values("t", kind="stable", ignore_index=True)

        wm = state.getCurrentWatermarkMs() * 1000    # state times are µs
        sealed_l = L["t"].values <= wm
        emit = L[sealed_l]
        out = pd.DataFrame(columns=["k", "t"]
                           + [f"l_{c}" for c in lcols]
                           + [f"r_{c}" for c in rcols] + ["rt"])
        if len(emit) and len(R):
            rhs = R.copy()
            rhs["rt"] = rhs["t"]
            merged = pd.merge_asof(emit, rhs, on="t", by="k",
                                   direction="backward",
                                   tolerance=tol_us)
            merged = merged[merged["rt"].notna()]
            for j, c in enumerate(rcols):     # undo NaN-padding upcast
                if r_cast[j] is not None:
                    merged[f"r_{c}"] = merged[f"r_{c}"].astype(r_cast[j])
            merged["rt"] = merged["rt"].astype("int64")
            out = merged
        elif len(emit):
            out = out.iloc[0:0]

        # retain: unsealed lefts; unsealed rights + the single latest
        # sealed right per key (older sealed rights can never win again)
        Lr = L[~sealed_l]
        sealed_r = R["t"].values <= wm
        keep = ~sealed_r
        if sealed_r.any():
            pos = np.flatnonzero(sealed_r)
            last = (pd.Series(pos, index=R["k"].values[sealed_r])
                    .groupby(level=0).last().values)
            keep[last] = True
        Rr = R[keep]

        state.update((
            _STATE_VERSION,
            Lr["k"].tolist(), Lr["t"].tolist(),
            Rr["k"].tolist(), Rr["t"].tolist(),
            *[Lr[f"l_{c}"].tolist() for c in lcols],
            *[Rr[f"r_{c}"].tolist() for c in rcols]))
        if len(Lr):
            # flush when the watermark passes the oldest pending left
            # (timeout API is ms; round µs up)
            state.setTimeoutTimestamp(-(-int(Lr["t"].min()) // 1000))

        res = pd.DataFrame({
            out_cols[0]: out["k"],
            out_cols[1]: pd.to_datetime(out["t"], unit="us", utc=True)
            .dt.tz_localize(None),
            **{c: out[f"l_{c}"] for c in lcols},
            **{c + suffix: out[f"r_{c}"] for c in rcols},
            out_cols[-1]: pd.to_datetime(out["rt"], unit="us", utc=True)
            .dt.tz_localize(None),
        })
        yield res

    return (u.groupBy("_b")
            .applyInPandasWithState(
                process, out_schema, state_schema, "append",
                GroupStateTimeout.EventTimeTimeout))
