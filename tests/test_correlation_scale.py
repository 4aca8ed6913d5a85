"""Large-universe correlation: join path vs matrix path equivalence and
pair-count law at n >> demo size (README.MD:41: (n²−n)/2 per slide)."""

from __future__ import annotations

import math
import time
from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from data_timeseries_java_spark.operators import (
    CorrelationConfig,
    pairwise_correlations,
)
from data_timeseries_java_spark.operators.correlation import (
    pairwise_correlations_matrix,
)
from data_timeseries_java_spark.schemas import RETURN_SCHEMA

N_KEYS = 60
N_POINTS = 12  # minutes of 1-min returns → two 10-min/5-min slides count
T0 = 1_700_000_040_000 // 600_000 * 600_000  # aligned to 10-min grid

CFG = CorrelationConfig(window="600 seconds", slide="300 seconds",
                        min_corr=0.0, propagate_nan=True)


@pytest.fixture(scope="module")
def returns(spark):
    # deterministic pseudo-random returns: key i, minute m
    rows = []
    for i in range(N_KEYS):
        for m in range(N_POINTS):
            v = math.sin(i * 12.9898 + m * 78.233) % 0.1
            rows.append((f"K-{i:03d}",
                         datetime.fromtimestamp((T0 + m * 60_000) / 1000,
                                                tz=timezone.utc), v))
    return spark.createDataFrame(rows, RETURN_SCHEMA).cache()


def test_pair_count_law(returns):
    out = pairwise_correlations(returns, CFG)
    per_window = {r.window_start: r["count"]
                  for r in out.groupBy("window_start").count().collect()}
    expect = N_KEYS * (N_KEYS - 1) // 2
    # interior (full) windows must carry the complete pair space
    full = [c for c in per_window.values() if c == expect]
    assert full, f"no full window had {expect} pairs: {per_window}"


def test_matrix_kernel_duplicate_observations(spark, returns):
    """At-least-once delivery replays (key, time) observations; the
    kernel must collapse duplicates to ONE matrix cell (keep-first)
    instead of letting fancy-index assignment double-count or let the
    last replica win — result and overlap counts must equal the
    deduplicated input's."""
    dup = returns.unionAll(returns)  # every observation delivered twice
    clean = {(r.window_start, r.key1, r.key2): (round(r.value, 9),
                                                r.x_count, r.is_nan)
             for r in pairwise_correlations_matrix(returns, CFG).collect()}
    with_dups = {(r.window_start, r.key1, r.key2): (round(r.value, 9),
                                                    r.x_count, r.is_nan)
                 for r in pairwise_correlations_matrix(dup, CFG).collect()}
    assert clean == with_dups


def test_matrix_path_matches_join_path(returns):
    join_out = {(r.window_start, r.key1, r.key2): r
                for r in pairwise_correlations(returns, CFG).collect()}
    mat_out = {(r.window_start, r.key1, r.key2): r
               for r in pairwise_correlations_matrix(returns, CFG).collect()}
    assert set(join_out) == set(mat_out)
    for k, jr in join_out.items():
        mr = mat_out[k]
        assert jr.is_nan == mr.is_nan
        if not jr.is_nan:
            assert abs(jr.value - mr.value) < 1e-9, k
