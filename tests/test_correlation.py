"""Correlation-stage tests: numpy oracle, invariants, reference config.

The reference has no correlation golden (its tests stop at candles); per
SURVEY.md §5 we compute the oracle independently with numpy over the same
sorted arrays.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_timeseries_java_spark.fixtures import demo_instruments, demo_ticks
from data_timeseries_java_spark.operators import (
    CorrelationConfig,
    log_returns,
    pairwise_correlations,
    pairwise_correlations_exact,
)
from data_timeseries_java_spark.operators.candles import candles_pipeline

CFG = CorrelationConfig(window="600 seconds", slide="300 seconds",
                        min_corr=0.0, propagate_nan=True,
                        include_underlying=True)


@pytest.fixture(scope="module")
def returns(spark):
    ticks = demo_ticks(spark)
    candles = candles_pipeline(ticks, demo_instruments(spark), "120 seconds")
    return log_returns(candles).cache()


@pytest.fixture(scope="module")
def corr(returns):
    return pairwise_correlations(returns, CFG).cache()


def test_pair_count_per_window(corr):
    # (n^2 - n) / 2 = 10 pairs for n=5 (README.MD:41), in every full window.
    per_window = corr.groupBy("window_start").count().collect()
    assert per_window, "no windows produced"
    full = [r for r in per_window if r["count"] == 10]
    assert len(full) >= 2  # interior windows see all 5 keys


def test_correlation_range_invariant(corr):
    bad = corr.where(
        ~F.col("is_nan") & ((F.col("value") > 1.0000001) | (F.col("value") < -1.0000001))
    )
    assert bad.count() == 0
    # NaN policy: propagated NaN is encoded value=1.0 + is_nan=true
    # (ComputeCorrelationsDoFn.java:188-193)
    assert corr.where(F.col("is_nan") & (F.col("value") != 1.0)).count() == 0


def test_perfect_correlation_ts1_ts2(corr):
    # TS-1 and TS-2 are identical series → r == 1 in every shared window.
    rows = corr.where((F.col("key1") == "TS-1") & (F.col("key2") == "TS-2")).collect()
    assert rows
    for r in rows:
        if not r.is_nan:
            assert abs(r.value - 1.0) < 1e-9


def test_numpy_oracle(corr):
    # Recompute r from the carried underlying arrays with numpy.
    rows = corr.where(~F.col("is_nan")).collect()
    assert rows
    for r in rows:
        x = [p.value for p in r.x_values]
        y = [p.value for p in r.y_values]
        expect = float(np.corrcoef(x, y)[0, 1])
        assert math.isfinite(expect)
        assert abs(r.value - expect) < 1e-9, (r.key1, r.key2, r.window_start)


def test_exact_variant_matches_builtin(returns):
    cfg = CorrelationConfig(window="600 seconds", slide="300 seconds",
                            min_corr=0.0, propagate_nan=True)
    fast = {(r.window_start, r.key1, r.key2): r
            for r in pairwise_correlations(returns, cfg).collect()}
    exact = {(r.window_start, r.key1, r.key2): r
             for r in pairwise_correlations_exact(returns, cfg).collect()}
    assert set(fast) == set(exact)
    for k, fr in fast.items():
        er = exact[k]
        assert fr.is_nan == er.is_nan
        if not fr.is_nan:
            assert abs(fr.value - er.value) < 1e-9
        assert fr.x_count == er.x_count


def test_min_corr_threshold_filters(returns):
    cfg = CorrelationConfig(window="600 seconds", slide="300 seconds",
                            min_corr=0.9, propagate_nan=False)
    out = pairwise_correlations(returns, cfg)
    assert out.where(F.abs(F.col("value")) < 0.9).count() == 0
