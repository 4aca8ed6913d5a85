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


def test_engle_granger_matches_numpy_ols(spark):
    """Synthetic cointegrated pair: operator's beta/alpha/rho/adf_t equal
    the closed-form numpy computation on the same series."""
    import numpy as np
    from datetime import datetime, timedelta, timezone

    from data_timeseries_java_spark.operators.correlation import engle_granger
    from pyspark.sql import functions as F

    t0 = datetime(2024, 1, 1, tzinfo=timezone.utc)
    n = 60
    x = np.linspace(100.0, 110.0, n)
    e = np.array([1.0 if i % 2 == 0 else -1.0 for i in range(n)])
    y = 5.0 + 2.0 * x + e
    rows = [("AAA", t0 + timedelta(hours=i), float(x[i])) for i in range(n)]
    rows += [("BBB", t0 + timedelta(hours=i), float(y[i])) for i in range(n)]
    df = spark.createDataFrame(
        rows, "key string, window_start timestamp, px double")
    out = engle_granger(df, price=F.col("px")).collect()
    assert len(out) == 1
    r = out[0]
    # numpy closed form, replicating the operator's rounded-sums
    # convention (sums rounded at 6, beta/alpha at 9)
    nn = float(n)
    sx, sy = round(x.sum(), 6), round(y.sum(), 6)
    sxx, sxy = round((x * x).sum(), 6), round((x * y).sum(), 6)
    beta = round((nn * sxy - sx * sy) / (nn * sxx - sx * sx), 9)
    alpha = round((sy - beta * sx) / nn, 9)
    res = y - alpha - beta * x
    ep, de = res[:-1], np.diff(res)
    s1 = round((ep * de).sum(), 6)
    s2 = round((ep * ep).sum(), 6)
    s3 = round((de * de).sum(), 6)
    rho = s1 / s2
    ssr = s3 - 2.0 * rho * s1 + rho * rho * s2
    se = np.sqrt(ssr / (len(de) - 1) / s2)
    assert r.key1 == "AAA" and r.key2 == "BBB" and r.n == n
    assert abs(r.beta - beta) < 1e-9
    assert abs(r.alpha - alpha) < 1e-7
    assert abs(r.rho - rho) < 1e-9
    assert abs(r.adf_t - rho / se) < 1e-9
    # alternating residuals mean-revert hard: rho near -2, t strongly negative
    assert r.rho < -1.5 and r.adf_t < -5


def test_ewma_pair_covariance_matches_recursion(spark):
    """Pair covariance / per-key variance follow the adjust=False
    recursion seeded at the first product; corr bounded by [-1, 1]."""
    import numpy as np
    from datetime import datetime, timedelta, timezone

    from data_timeseries_java_spark.operators.correlation import (
        ewma_pair_covariance)

    rng = np.random.default_rng(5)
    t0 = datetime(2024, 1, 1, tzinfo=timezone.utc)
    n = 40
    ra = rng.normal(0, 1e-3, n)
    rb = 0.5 * ra + rng.normal(0, 1e-3, n)
    rows = [("A", t0 + timedelta(hours=i), float(ra[i])) for i in range(n)]
    rows += [("B", t0 + timedelta(hours=i), float(rb[i])) for i in range(n)]
    df = spark.createDataFrame(rows, "key string, time timestamp, value double")
    out = sorted(ewma_pair_covariance(df, alpha=0.0625).collect(),
                 key=lambda r: r.time)
    assert len(out) == n

    def rec(xs):
        y = np.empty(len(xs)); y[0] = xs[0]
        for i in range(1, len(xs)):
            y[i] = (1.0 - 0.0625) * y[i - 1] + 0.0625 * xs[i]
        return y

    cov = rec(ra * rb)
    va, vb = rec(ra * ra), rec(rb * rb)
    for i, r in enumerate(out):
        assert r.key1 == "A" and r.key2 == "B"
        assert abs(r.ewma_cov - cov[i]) < 1e-15
        assert abs(r.ewma_corr - cov[i] / np.sqrt(va[i] * vb[i])) < 1e-9
        assert -1 - 1e-9 <= r.ewma_corr <= 1 + 1e-9
