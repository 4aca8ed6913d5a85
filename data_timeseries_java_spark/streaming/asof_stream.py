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
