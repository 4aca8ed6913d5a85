"""Temporal joins Spark lacks as primitives: as-of join and range join.

As-of join (for each left row, the latest right row at-or-before its
timestamp, per key) is THE time-series join — point-in-time feature
lookup, trade-vs-quote matching. Spark has no ASOF JOIN; the scalable
formulation is union + last-value window, NOT a range self-join:

    union(left, right) → window last(right_cols, ignorenulls)
    over (key ORDER BY time, side) → keep left rows

One shuffle on key, linear scan per key — versus the O(left x right)
blow-up of the naive `l.time >= r.time` join Catalyst would otherwise
plan as a broadcast-nested-loop.

Range join (row matched to the interval containing it): for
grid-aligned intervals (candle windows), the efficient rewrite is
computing the interval key arithmetically and equi-joining — the oracle
proves the rewrite equals a true BETWEEN join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame,
              on: str, left_time: str = "time", right_time: str = "time",
              right_cols: list[str] | None = None,
              suffix: str = "_asof",
              tolerance: str | None = None) -> DataFrame:
    """For each left row: attach the right row with the greatest
    ``right_time <= left_time`` for the same ``on`` key (inner
    semantics: left rows with no prior right row are dropped).

    ``tolerance`` (an INTERVAL string, e.g. ``"5 minutes"``) drops
    matches older than ``left_time - tolerance`` — the stale-quote
    guard of pandas ``merge_asof(tolerance=)``. Applied as a
    post-filter on the matched timestamp, so the plan stays the single
    union + last-value window."""
    right_cols = right_cols or [c for c in right.columns
                                if c not in (on, right_time)]
    l = left.withColumn("_t", F.col(left_time)).withColumn("_side", F.lit(1))
    r = (right.select(on, F.col(right_time).alias("_t"),
                      *[F.col(c).alias(c + suffix) for c in right_cols],
                      F.col(right_time).alias(right_time + suffix))
         .withColumn("_side", F.lit(0)))
    for c in l.columns:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None))
    for c in r.columns:
        if c not in l.columns:
            l = l.withColumn(c, F.lit(None))
    u = l.unionByName(r.select(*l.columns))
    # right rows sort before left rows at equal time → <= semantics
    w = (Window.partitionBy(on).orderBy("_t", "_side")
         .rowsBetween(Window.unboundedPreceding, 0))
    filled = u.select(
        *[c for c in left.columns],
        F.col("_side"),
        *[F.last(c + suffix, ignorenulls=True).over(w).alias(c + suffix)
          for c in right_cols],
        F.last(right_time + suffix, ignorenulls=True).over(w)
         .alias(right_time + suffix),
    )
    out = (filled.where((F.col("_side") == 1)
                        & F.col(right_time + suffix).isNotNull())
           .drop("_side"))
    if tolerance is not None:
        out = out.where(
            F.col(right_time + suffix)
            >= F.col(left_time) - F.expr(f"INTERVAL {tolerance}"))
    return out


def scd2_build(df: DataFrame, key_col: str, attr_col: str,
               time_col: str = "ts",
               tiebreak_col: str | None = None) -> DataFrame:
    """Slowly-changing-dimension type 2 build: collapse an event log into
    versioned dimension rows — one row per run of consecutive equal
    ``attr_col`` values per key, with ``valid_from`` / ``valid_to``
    half-open intervals and an ``is_current`` flag. The standard gaps-
    and-islands construction: a lag-change marker, a running sum to
    number runs, one aggregation per run, then ``lead`` for the closing
    timestamp.

    ``tiebreak_col`` (a unique id) makes the event ordering total, so
    run boundaries are deterministic even when timestamps collide.

    Shape at 100 TB: one shuffle on ``key_col`` shared by both window
    passes and the run aggregation (same partitioning — Catalyst reuses
    the exchange), output is dimension-sized (runs, not events).
    """
    order = [F.col(time_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    prev = F.lag(F.col(attr_col)).over(w)
    changed = (prev.isNull() | (prev != F.col(attr_col))).cast("long")
    grp = F.sum(changed).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    runs = (df.withColumn("_grp", grp)
            .groupBy(key_col, "_grp")
            .agg(F.min(F.col(attr_col)).alias(attr_col),
                 F.min(F.col(time_col)).alias("valid_from"),
                 F.count(F.lit(1)).alias("n_events")))
    w2 = Window.partitionBy(key_col).orderBy("_grp")
    return (runs
            .withColumn("version", F.col("_grp").cast("int"))
            .withColumn("valid_to", F.lead("valid_from").over(w2))
            .withColumn("is_current", F.col("valid_to").isNull())
            .drop("_grp"))
