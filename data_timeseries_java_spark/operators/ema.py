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


def holt_linear(series: DataFrame, alpha: float = 0.25,
                beta: float = 0.125,
                key_col: str = "key", time_col: str = "time",
                value_col: str = "value") -> DataFrame:
    """Holt's linear-trend (double exponential) smoothing per key —
    the standard two-equation recursion (Holt 1957, public):

        level_t = α·x_t + (1−α)·(level_{t−1} + trend_{t−1})
        trend_t = β·(level_t − level_{t−1}) + (1−β)·trend_{t−1}

    with level_0 = x_0, trend_0 = 0. Like :func:`ema` this is an
    inherently recursive series operator (grouped-map pandas, one
    shuffle on key; per-key series are candle-sized so a group always
    fits an Arrow batch).

    The DEFAULTS are dyadic rationals on purpose: α=0.25, β=0.125 make
    1−α and 1−β exact binary doubles, so a SQL oracle writing the
    literals 0.75/0.875 performs bit-identical IEEE arithmetic and the
    6-decimal rounded outputs hash-match (a 0.3/0.7 pair would NOT —
    the literal 0.7 and the computed 1.0−0.3 are different doubles).
    Output: key, time, value, level, trend."""
    import numpy as np
    import pandas as pd  # noqa: F401

    one_m_alpha = 1.0 - alpha
    one_m_beta = 1.0 - beta

    def compute(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(time_col).reset_index(drop=True)
        x = pdf[value_col].to_numpy(dtype="float64")
        n = len(x)
        level = np.empty(n)
        trend = np.empty(n)
        if n:
            lv, tr = x[0], 0.0
            level[0], trend[0] = lv, tr
            for i in range(1, n):
                lv_new = alpha * x[i] + one_m_alpha * (lv + tr)
                tr = beta * (lv_new - lv) + one_m_beta * tr
                lv = lv_new
                level[i], trend[i] = lv, tr
        pdf["level"] = level
        pdf["trend"] = trend
        return pdf[[key_col, time_col, value_col, "level", "trend"]]

    fields = dict(series.dtypes)
    schema = (f"{key_col} {fields[key_col]}, {time_col} {fields[time_col]}, "
              f"{value_col} {fields[value_col]}, level double, trend double")
    return series.groupBy(key_col).applyInPandas(compute, schema)


def kalman_local_level(series: DataFrame, q: float = 0.001,
                       r: float = 0.01,
                       key_col: str = "key", time_col: str = "time",
                       value_col: str = "value") -> DataFrame:
    """1-D Kalman filter on the local-level model (public textbook
    recursion — Kalman 1960; Durbin & Koopman's simplest case):

        p_pred = p + q                       (predict variance)
        k      = p_pred / (p_pred + r)       (gain)
        level  = level + k·(z − level)       (update)
        p      = (1 − k)·p_pred

    with level_0 = z_0, p_0 = 1. The adaptive-gain cousin of
    :func:`ema` (gain converges to the steady-state ratio instead of a
    fixed α); same grouped-map shape, one shuffle on key. Every step
    is plain IEEE +,−,×,÷ in a FIXED expression order, so a SQL
    RECURSIVE CTE writing the identical expressions reproduces the
    doubles bit-for-bit. Output: key, time, value, kf_level, kf_gain,
    kf_var."""
    import numpy as np
    import pandas as pd  # noqa: F401

    def compute(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(time_col).reset_index(drop=True)
        z = pdf[value_col].to_numpy(dtype="float64")
        n = len(z)
        level = np.empty(n)
        gain = np.empty(n)
        var = np.empty(n)
        if n:
            lv, p = z[0], 1.0
            level[0], gain[0], var[0] = lv, 0.0, p
            for i in range(1, n):
                p_pred = p + q
                k = p_pred / (p_pred + r)
                lv = lv + k * (z[i] - lv)
                p = (1.0 - k) * p_pred
                level[i], gain[i], var[i] = lv, k, p
        pdf["kf_level"] = level
        pdf["kf_gain"] = gain
        pdf["kf_var"] = var
        return pdf[[key_col, time_col, value_col,
                    "kf_level", "kf_gain", "kf_var"]]

    fields = dict(series.dtypes)
    schema = (f"{key_col} {fields[key_col]}, {time_col} {fields[time_col]}, "
              f"{value_col} {fields[value_col]}, "
              f"kf_level double, kf_gain double, kf_var double")
    return series.groupBy(key_col).applyInPandas(compute, schema)


def garch_vol(series: DataFrame, alpha: float = 0.125,
              beta: float = 0.75, omega: float = 0.000001,
              key_col: str = "key", time_col: str = "time",
              value_col: str = "value") -> DataFrame:
    """GARCH(1,1) conditional-variance filtering per key (Bollerslev
    1986, public) with FIXED parameters (filtering, not estimation):

        var_t = ω + α·r_{t−1}² + β·var_{t−1},    var_0 = r_0²

    The volatility-clustering companion to :func:`kalman_local_level`.
    α and β default to dyadic rationals and ω to an exact literal for
    the same cross-engine bit-exactness contract as the other
    recursions. Output: key, time, value, garch_var, garch_vol
    (= sqrt(var))."""
    import numpy as np
    import pandas as pd  # noqa: F401

    def compute(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(time_col).reset_index(drop=True)
        r = pdf[value_col].to_numpy(dtype="float64")
        n = len(r)
        var = np.empty(n)
        if n:
            v = r[0] * r[0]
            var[0] = v
            for i in range(1, n):
                v = omega + alpha * (r[i - 1] * r[i - 1]) + beta * v
                var[i] = v
        pdf["garch_var"] = var
        pdf["garch_vol"] = np.sqrt(var)
        return pdf[[key_col, time_col, value_col, "garch_var", "garch_vol"]]

    fields = dict(series.dtypes)
    schema = (f"{key_col} {fields[key_col]}, {time_col} {fields[time_col]}, "
              f"{value_col} {fields[value_col]}, "
              f"garch_var double, garch_vol double")
    return series.groupBy(key_col).applyInPandas(compute, schema)


def macd(series: DataFrame, span_fast: int = 12, span_slow: int = 26,
         span_signal: int = 9, key_col: str = "key", time_col: str = "time",
         value_col: str = "value") -> DataFrame:
    """MACD (Appel's moving-average convergence/divergence) per key:
    fast/slow EMAs of the series, their difference, and an EMA signal
    line of that difference — three adjust=False recursions sharing one
    per-key sorted pass (α = 2/(span+1), the standard span mapping):

        ema_f = EMA(x, span_fast);  ema_s = EMA(x, span_slow)
        macd  = ema_f − ema_s;      signal = EMA(macd, span_signal)
        hist  = macd − signal

    Like :func:`ema`, inherently recursive — grouped-map pandas, one
    shuffle on key, candle-sized groups. The DuckDB oracle replays the
    same three IEEE-double recursions in a single RECURSIVE CTE
    (ema_f, ema_s, signal carried as frontier columns), so 6-decimal
    rounding hash-matches bit-for-bit.
    """
    import pandas as pd  # noqa: F401

    def compute(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(time_col).reset_index(drop=True)
        f = pdf[value_col].ewm(span=span_fast, adjust=False).mean()
        s = pdf[value_col].ewm(span=span_slow, adjust=False).mean()
        pdf["macd"] = f - s
        pdf["signal"] = pdf["macd"].ewm(span=span_signal, adjust=False).mean()
        pdf["histogram"] = pdf["macd"] - pdf["signal"]
        return pdf[[key_col, time_col, value_col,
                    "macd", "signal", "histogram"]]

    fields = dict(series.dtypes)
    schema = (f"{key_col} {fields[key_col]}, {time_col} {fields[time_col]}, "
              f"{value_col} {fields[value_col]}, macd double, "
              f"signal double, histogram double")
    return series.groupBy(key_col).applyInPandas(compute, schema)
