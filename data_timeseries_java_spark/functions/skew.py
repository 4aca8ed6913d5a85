"""Hot-key (skew) mitigation.

AQE's skew-join splitting handles most cases at runtime
(``spark.sql.adaptive.skewJoin.enabled`` is on in session defaults);
salting is the explicit tool for skewed AGGREGATIONS, where one key's
rows overwhelm a single reducer. Two-phase: salt the key → partial
aggregate per (key, salt) → final aggregate per key. Works for any
algebraic aggregate; here the common sum/count case.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum(df: DataFrame, key_cols: list[str], value_col: str,
               n_salts: int = 16,
               out_col: str | None = None) -> DataFrame:
    """Sum `value_col` per `key_cols` with salted two-phase aggregation.

    At 100 TB a single hot instrument (half the tick volume on one key)
    serializes one reducer; salting spreads the partial sums across
    ``n_salts`` reducers and the final pass touches only
    keys x n_salts rows.

    Thin wrapper over the general machinery in ``operators/skew.py``
    (`salted_agg` handles any decomposable aggregate set and a
    deterministic salt column; `two_phase_distinct` covers the
    count-distinct case, where salting alone does not reduce state).
    """
    from data_timeseries_java_spark.operators.skew import salted_agg

    out_col = out_col or f"sum_{value_col}"
    return salted_agg(df, key_cols, None, n_salts,
                      {out_col: (F.sum(value_col), F.sum(out_col))})
