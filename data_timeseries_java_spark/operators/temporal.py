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
              suffix: str = "_asof") -> DataFrame:
    """For each left row: attach the right row with the greatest
    ``right_time <= left_time`` for the same ``on`` key (inner
    semantics: left rows with no prior right row are dropped)."""
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
    return (filled.where((F.col("_side") == 1)
                         & F.col(right_time + suffix).isNotNull())
            .drop("_side"))
