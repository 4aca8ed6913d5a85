"""Isolated decade for the SemDeDup ASSIGNMENT stage — the piece
semantic_dedup_ann makes tractable when the centroid count k tracks the
corpus (SemDeDup keeps cluster SIZE constant, so k ~ n and the exact
nearest-centroid scan is O(n*k*d), quadratic in corpus size).

Training is excluded by design: assignment cost depends only on the
SIZE of the centroid table, so the bench uses the k-means SEED set
(every 50th vector) as the centroid table at each scale — k = n/50
exactly as the declared query trains it. The SRP path widens its bands
with log2(k) (the documented knob: collisions/vector ~ n_bands *
k / 2**band_bits stays ~constant), exactly what a production deployment
re-tunes per corpus.

Prints exact (ivf_assign) vs SRP-banded (srp_assign) medians of
$SPARK_GRAFT_TRIALS (default 3) at 1x/10x/100x."""

from __future__ import annotations

import hashlib
import math
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM = 64


def _signs(n_planes: int) -> list[list[int]]:
    # same md5-lane convention as queries.similarity._srp_signs
    return [[1 if hashlib.md5(f"{j}:{i}".encode()).hexdigest()[0]
             in "89abcdef" else -1
             for i in range(DIM)]
            for j in range(n_planes)]


def main() -> None:
    from pyspark.sql import functions as F

    from data_timeseries_java_spark import get_spark
    from data_timeseries_java_spark.operators.similarity import (
        ivf_assign,
        srp_assign,
    )
    from data_timeseries_java_spark.queries.similarity import (
        N_CENTROIDS_STRIDE)
    from data_timeseries_java_spark.tables import load_table

    n_trials = int(os.environ.get("SPARK_GRAFT_TRIALS", "3"))
    paths = os.environ.get("SPARK_GRAFT_PATHS", "exact,srp").split(",")
    max_reps = int(os.environ.get("SPARK_GRAFT_MAX_REPS", "100"))
    spark = get_spark("bench-semdedup-assign")
    spark.sparkContext.setLogLevel("ERROR")
    emb1 = load_table(spark, "/root/testdata/sf0.1", "embeddings")
    print(f"{'path':8s}{'scale':>7s}{'vectors':>9s}{'k':>7s}"
          f"{'bands':>12s}{'median_s':>10s}{'vecs/s':>9s}")
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
        cent = emb.where(
            F.col("vec_id") % N_CENTROIDS_STRIDE == 0).cache()
        k = cent.count()
        band_bits = max(4, math.ceil(math.log2(max(k, 2))))
        signs = _signs(4 * band_bits)
        for name, build in (
                ("exact", lambda e=emb, c=cent: ivf_assign(e, c)),
                ("srp", lambda e=emb, c=cent, s=signs, b=band_bits:
                 srp_assign(e, c, s, band_bits=b))):
            if name not in paths:
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
                  f"{f'4x{band_bits}b':>12s}{med:>10.3f}"
                  f"{n / med:>9.0f}")
        emb.unpersist(); cent.unpersist()


if __name__ == "__main__":
    main()
