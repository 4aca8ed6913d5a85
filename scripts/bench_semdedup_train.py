"""Isolated decade for the SemDeDup TRAINING stage — the last
n-proportional term after srp_assign made assignment linear.

The corpus-trained path (kmeans_centroids, seeds = every 50th vector)
has k ~ n, so each Lloyd iteration does O(n*k*d) work: quadratic in
corpus size, ~100x per decade. The fixed-k path
(kmeans_centroids_fixedk — the SemDeDup paper's own recipe) trains on a
bounded scrambled-id sample with k fixed, so training work is
O(S*k*d) = CONSTANT in n; the only n-proportional piece left is the
top-S sample selection (a narrow per-partition top-S, no global sort).

Prints corpus-trained vs fixed-k medians of $SPARK_GRAFT_TRIALS
(default 3) at 1x/10x/100x. The corpus path is capped at
$SPARK_GRAFT_CORPUS_MAX_REPS (default 10 — the 100x leg is the known
quadratic; see SCALE.md §SemDeDup)."""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from data_timeseries_java_spark import get_spark
    from data_timeseries_java_spark.operators.similarity import (
        kmeans_centroids,
        kmeans_centroids_fixedk,
    )
    from data_timeseries_java_spark.queries.similarity import (
        FIXEDK_K,
        FIXEDK_SAMPLE,
        KMEANS_ITERS,
        N_CENTROIDS_STRIDE,
    )
    from data_timeseries_java_spark.tables import load_table

    n_trials = int(os.environ.get("SPARK_GRAFT_TRIALS", "3"))
    paths = os.environ.get("SPARK_GRAFT_PATHS", "corpus,fixedk").split(",")
    max_reps = int(os.environ.get("SPARK_GRAFT_MAX_REPS", "100"))
    corpus_max = int(os.environ.get("SPARK_GRAFT_CORPUS_MAX_REPS", "10"))
    spark = get_spark("bench-semdedup-train")
    spark.sparkContext.setLogLevel("ERROR")
    emb1 = load_table(spark, "/root/testdata/sf0.1", "embeddings")
    print(f"{'path':8s}{'scale':>7s}{'vectors':>9s}{'k':>7s}"
          f"{'median_s':>10s}{'vecs/s':>9s}")
    for reps in (1, 10, 100):
        if reps > max_reps:
            continue
        emb = emb1 if reps == 1 else emb1.crossJoin(
            F.broadcast(spark.range(reps).select(
                F.col("id").alias("_rep")))).select(
            (F.col("vec_id") * reps + F.col("_rep")).alias("vec_id"),
            "label", "embedding")
        emb = emb.cache()
        n = emb.count()
        k_corpus = n // N_CENTROIDS_STRIDE
        for name, k, build in (
                ("corpus", k_corpus, lambda e=emb: kmeans_centroids(
                    e, seed_stride=N_CENTROIDS_STRIDE,
                    iterations=KMEANS_ITERS)),
                ("fixedk", FIXEDK_K, lambda e=emb: kmeans_centroids_fixedk(
                    e, k=FIXEDK_K, sample_size=FIXEDK_SAMPLE,
                    iterations=KMEANS_ITERS))):
            if name not in paths:
                continue
            if name == "corpus" and reps > corpus_max:
                print(f"{name:8s}{reps:>6d}x{n:>9d}{k:>7d}"
                      f"{'(skipped: known quadratic)':>19s}")
                continue
            ts = []
            for i in range(n_trials + 1):
                df = build()
                t0 = time.time()
                df.write.format("noop").mode("overwrite").save()
                if i:
                    ts.append(time.time() - t0)
            med = statistics.median(ts)
            print(f"{name:8s}{reps:>6d}x{n:>9d}{k:>7d}"
                  f"{med:>10.3f}{n / med:>9.0f}")
        emb.unpersist()


if __name__ == "__main__":
    main()
