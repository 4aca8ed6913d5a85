"""Streaming realized volatility: live per-instrument vol monitoring.

The batch operator (``operators.resample.realized_volatility``) is a
stateless tumbling-window aggregation over decomposable sums, which is
exactly the plan Structured Streaming executes incrementally — so the
streaming variant IS the batch plan behind a watermark, not a parallel
implementation. Windows finalize (append mode) once the watermark
passes window end; state is O(open windows x keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def streaming_realized_volatility(returns: DataFrame,
                                  resolution: str = "1 hour",
                                  watermark: str = "0 seconds") -> DataFrame:
    """Watermarked realized vol over a (key, time, value) returns
    stream. Same output schema as the batch operator: (key,
    window_start, n_rets, realized_vol)."""
    from data_timeseries_java_spark.operators.resample import (
        realized_volatility)

    return realized_volatility(
        returns.withWatermark("time", watermark), resolution)
