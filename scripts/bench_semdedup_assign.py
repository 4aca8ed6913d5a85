"""Isolated decade for the SemDeDup ASSIGNMENT stage — the piece
semantic_dedup_ann makes linear. Production shape (SemDeDup, Abbas et
al. 2023): centroids are trained ONCE on a fixed-size sample with fixed
k, then the whole corpus is assigned. Training cost is thus constant;
what must scale is assignment. This bench pins the centroid set (k=40,
trained at 1x) and measures exact (ivf_assign, O(n*k*d) scan) vs
SRP-banded (srp_assign, collision-bounded) assignment over replicated
vector sets, median of $SPARK_GRAFT_TRIALS (default 3)."""

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
        centroid_vectors,
        ivf_assign,
        kmeans_centroids,
        srp_assign,
    )
    from data_timeseries_java_spark.queries.similarity import (
        KMEANS_ITERS,
        N_CENTROIDS_STRIDE,
        SRP_BAND_BITS,
        _srp_signs,
    )
    from data_timeseries_java_spark.tables import load_table

    n_trials = int(os.environ.get("SPARK_GRAFT_TRIALS", "3"))
    spark = get_spark("bench-semdedup-assign")
    spark.sparkContext.setLogLevel("ERROR")
    emb1 = load_table(spark, "/root/testdata/sf0.1", "embeddings")
    cent = centroid_vectors(kmeans_centroids(
        emb1, seed_stride=N_CENTROIDS_STRIDE,
        iterations=KMEANS_ITERS)).cache()
    k = cent.count()  # materialize the trained set once
    signs = _srp_signs()
    print(f"fixed centroid set: k={k} (trained once at 1x)")
    print(f"{'path':12s}{'scale':>8s}{'vectors':>10s}{'median_s':>10s}"
          f"{'vecs/s':>10s}")
    for reps in (1, 10, 100):
        emb = emb1 if reps == 1 else emb1.crossJoin(
            F.broadcast(spark.range(reps).select(
                F.col("id").alias("_rep")))).select(
            (F.col("vec_id") * reps + F.col("_rep")).alias("vec_id"),
            "label", "embedding")
        n = emb.count()
        for name, build in (
                ("exact", lambda e=emb: ivf_assign(e, cent)),
                ("srp", lambda e=emb: srp_assign(
                    e, cent, signs, band_bits=SRP_BAND_BITS))):
            ts = []
            for i in range(n_trials + 1):
                df = build()
                t0 = time.time()
                df.write.format("noop").mode("overwrite").save()
                if i:
                    ts.append(time.time() - t0)
            med = statistics.median(ts)
            print(f"{name:12s}{reps:>7d}x{n:>10d}{med:>10.3f}"
                  f"{n / med:>10.0f}")


if __name__ == "__main__":
    main()
