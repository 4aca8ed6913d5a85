"""Log-return projection — P1 (SURVEY.md §2.4).

Reference: ``application/workpackets/DistributeWorkDataDoFn.java:53-80`` —
per candle, ``value = ln(close.ask / open.ask)`` (ask only), stamped with
the candle's close time. The reference re-keys by sliding-window max
timestamp to colocate one window's instruments; in Spark that colocation
is just the later ``groupBy(window)`` shuffle — no manual re-key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def log_returns(candles: DataFrame) -> DataFrame:
    """Candles → (key, time, value) log-return points.

    ``time`` is the candle close time (window end − 1 ms, the Beam
    ``maxTimestamp`` the reference stamps on candles). Candles with a
    non-positive open or close ask (possible only for leading gap candles
    that never saw a live tick) are dropped — ln is undefined there; the
    reference would emit -Inf/NaN which its correlation stage then skips.
    """
    return (
        candles
        .where((F.col("open.ask") > 0) & (F.col("close.ask") > 0))
        .select(
            "key",
            (F.col("window_end") - F.expr("INTERVAL 1 MILLISECOND")).alias("time"),
            F.log(F.col("close.ask") / F.col("open.ask")).alias("value"),
        )
    )
