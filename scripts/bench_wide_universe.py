"""Wide-universe scale point (r3 verdict ask #6): the 10x/100x study
scales events in TIME over a fixed 5-key universe, so the pair engines
stay overhead-dominated there. This benchmarks the orthogonal axis —
instrument count n at fixed duration — running BOTH correlation kernels
(the per-pair ``F.corr`` equi-join and the per-window BLAS matrix) at
n = 200 and n = 1000, so the pinned dispatcher crossover
(``CORR_MATRIX_CROSSOVER = 400``, ``operators/correlation.py``) is
demonstrated on the scaling table rather than asserted from one run.

The returns universe is synthesized Spark-side (``spark.range`` →
deterministic sin-hash values — no driver-side row building): n keys x
$SPARK_GRAFT_WIDE_MINUTES (default 60) one-minute points, 10-min/5-min
sliding windows → interior slides carry (n²−n)/2 pairs, the reference's
pair law (README.MD:41 — 499,500 pairs/slide at n=1000).

Prints a table for SCALE.md "Kernel selection"; median of
$SPARK_GRAFT_TRIALS (default 3) steady-state trials.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NS = (200, 1000)


def synth_returns(spark, n_keys: int, n_minutes: int):
    from pyspark.sql import functions as F

    t0 = 1_700_000_040_000 // 600_000 * 600_000  # aligned to 10-min grid
    base = spark.range(n_keys * n_minutes)
    return (base.select(
        F.format_string("K-%04d", (F.col("id") % n_keys)).alias("key"),
        F.timestamp_millis(
            F.lit(t0) + (F.col("id") / n_keys).cast("long") * 60_000
        ).alias("time"),
        (F.sin((F.col("id") % n_keys) * 12.9898
               + (F.col("id") / n_keys).cast("long") * 78.233) % 0.1
         ).alias("value")))


def main() -> None:
    from data_timeseries_java_spark import get_spark
    from data_timeseries_java_spark.operators import (
        CorrelationConfig,
        pairwise_correlations,
    )
    from data_timeseries_java_spark.operators.correlation import (
        pairwise_correlations_matrix,
        rank_top_pairs,
    )

    n_trials = int(os.environ.get("SPARK_GRAFT_TRIALS", "3"))
    n_minutes = int(os.environ.get("SPARK_GRAFT_WIDE_MINUTES", "60"))
    cfg = CorrelationConfig(window="600 seconds", slide="300 seconds",
                            min_corr=0.0, propagate_nan=True)
    spark = get_spark("bench-wide")
    spark.sparkContext.setLogLevel("ERROR")

    top_n = int(os.environ.get("SPARK_GRAFT_WIDE_TOP", "100"))
    print(f"{'n_keys':>7s} {'pairs/slide':>12s} {'shape':>10s} "
          f"{'join_s':>8s} {'matrix_s':>9s}  winner")
    for n in NS:
        rets = synth_returns(spark, n, n_minutes).cache()
        rets.count()  # settle the cache outside the timed region
        # Two output shapes: "full" emits every pair (output-bound for
        # the matrix kernel — O(windows x n²) rows cross the Arrow
        # boundary); "screened" is the at-scale usage (top-N per window
        # ranked in-kernel vs join + rank_top_pairs).
        shapes = {
            "full": (
                lambda: pairwise_correlations(rets, cfg, cache_input=False),
                lambda: pairwise_correlations_matrix(rets, cfg)),
            "screened": (
                lambda: rank_top_pairs(
                    pairwise_correlations(rets, cfg, cache_input=False),
                    top_n),
                lambda: pairwise_correlations_matrix(
                    rets, cfg, per_window_top=top_n)),
        }
        for shape, (join_k, matrix_k) in shapes.items():
            meds = {}
            for label, kernel in (("join", join_k), ("matrix", matrix_k)):
                trials = []
                for i in range(n_trials + 1):  # trial 0: discarded warm-up
                    df = kernel()
                    t = time.time()
                    df.write.format("noop").mode("overwrite").save()
                    if i:
                        trials.append(time.time() - t)
                meds[label] = statistics.median(trials)
            winner = min(meds, key=meds.get)
            print(f"{n:7d} {n * (n - 1) // 2:12d} {shape:>10s} "
                  f"{meds['join']:8.3f} {meds['matrix']:9.3f}  {winner}")
        rets.unpersist()


if __name__ == "__main__":
    main()
