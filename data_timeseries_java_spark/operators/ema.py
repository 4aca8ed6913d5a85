"""Exponential moving average — an inherently recursive per-key series
operator (ema_i = α·x_i + (1−α)·ema_{i−1}).

Not expressible with Spark's built-in window aggregates (the closed-form
rewrite overflows (1−α)^(−i) beyond a few hundred points), so this is a
textbook grouped-map Pandas operator: shuffle once on key, compute the
recursion vectorized per group with pandas' ewm. Per-key series are
candle-sized (1 row per resolution interval), so a group always fits an
Arrow batch even at 100 TB of underlying ticks.

One of the few intentionally non-SQL-expressible operators in the engine
— the driver's rows-only check applies (no DuckDB oracle); the test
oracle is numpy's direct recursion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ema(series: DataFrame, alpha: float = 0.2,
        key_col: str = "key", time_col: str = "time",
        value_col: str = "value") -> DataFrame:
    """EMA over each key's time-sorted series. Output: key, time, value,
    ema (ema_0 = x_0; adjust=False recursion)."""
    import pandas as pd  # noqa: F401

    def compute(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(time_col).reset_index(drop=True)
        pdf["ema"] = pdf[value_col].ewm(alpha=alpha, adjust=False).mean()
        return pdf[[key_col, time_col, value_col, "ema"]]

    fields = dict(series.dtypes)
    schema = (f"{key_col} {fields[key_col]}, {time_col} {fields[time_col]}, "
              f"{value_col} {fields[value_col]}, ema double")
    return series.groupBy(key_col).applyInPandas(compute, schema)
