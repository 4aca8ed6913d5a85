"""Focused measurement of the streaming-SemDeDup store-bucket pruning
(round-14, VERDICT r13 #4) in the regime where it applies.

The 10x audit replays embeddings UNIFORMLY: every 2,500-vector batch
touches all k=156 centroids, hence all 16 store buckets — the
partition-prune is inert by construction there (measured flat,
SCALE.md round-14). This bench builds the KEYED regime instead: replay
files are grouped by centroid bucket (each trigger touches ~2 of 16
buckets), and the same stream runs twice —

  store_buckets=16  -> per-trigger store read prunes to the touched
                       buckets' files (partition-column filter)
  store_buckets=1   -> single bucket, the isin filter keeps every
                       file: the unpruned baseline, same verdict work

Verdict-join work is IDENTICAL both ways (same clusters, same
precedence); the delta is purely what the per-trigger store re-scan
costs. Prints one JSON line with per-trigger medians for both runs
and asserts the two verdict sinks are row-identical.

Usage: python scripts/bench_semdedup_store_prune.py [sf_dir]
(default .scale10x)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_BUCKETS = 16


def main() -> None:
    from pyspark.sql import functions as F

    from data_timeseries_java_spark import get_spark
    from data_timeseries_java_spark.operators.similarity import (
        centroid_vectors, kmeans_centroids_fixedk, srp_assign)
    from data_timeseries_java_spark.plans.materialize import materialize
    from data_timeseries_java_spark.queries.similarity import (
        FIXEDK_K, KMEANS_ITERS, SAMPLE_PER_K, SEMDEDUP_T, SRP_BAND_BITS,
        _srp_signs, derived_tcs)
    from data_timeseries_java_spark.streaming.semdedup_stream import (
        streaming_semantic_dedup)
    from data_timeseries_java_spark.tables import load_table

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scale10x"
    spark = get_spark("semdedup-prune-bench")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding")
    n = emb.count()
    k = max(FIXEDK_K, n // derived_tcs(n))
    cent = materialize(centroid_vectors(kmeans_centroids_fixedk(
        emb, k=k, sample_size=SAMPLE_PER_K * k,
        iterations=KMEANS_ITERS)))

    root = tempfile.mkdtemp(prefix="sdprune_")
    # keyed replay: files grouped by centroid bucket (2 buckets/file)
    assign = srp_assign(emb, cent, _srp_signs(),
                        band_bits=SRP_BAND_BITS)
    keyed = (emb.join(assign, "vec_id", "left")
             .withColumn("_b", F.pmod(F.coalesce(
                 F.col("centroid_id"), F.lit(0)), F.lit(N_BUCKETS))))
    for i in range(8):
        (keyed.where(F.col("_b").isin([2 * i, 2 * i + 1]))
         .select("vec_id", "embedding").coalesce(1)
         .write.mode("overwrite").parquet(f"{root}/emb/f{i:02d}"))
    schema = spark.read.parquet(f"{root}/emb/f00").schema

    def run(buckets: int) -> tuple[list, str]:
        work = f"{root}/run{buckets}"
        src = (spark.readStream.schema(schema)
               .option("maxFilesPerTrigger", 1)
               .parquet(f"{root}/emb/f*"))
        walls: list[float] = []
        q = streaming_semantic_dedup(
            spark, src, work, cent, _srp_signs(),
            threshold=SEMDEDUP_T, band_bits=SRP_BAND_BITS,
            store_buckets=buckets)
        while q.isActive:
            time.sleep(0.3)
        q.awaitTermination()
        for p in q.recentProgress:
            if p["numInputRows"] > 0:
                walls.append(p["batchDuration"])
        return walls, f"{work}/verdicts"

    out = {}
    sinks = {}
    for b in (N_BUCKETS, 1):
        walls, vp = run(b)
        walls.sort()
        out[f"store_buckets_{b}"] = {
            "batches": len(walls),
            "median_batch_ms": walls[len(walls) // 2],
            "total_ms": sum(walls)}
        sinks[b] = vp

    a = spark.read.parquet(sinks[N_BUCKETS]).drop("batch_id")
    bdf = spark.read.parquet(sinks[1]).drop("batch_id")
    same = (a.exceptAll(bdf).count() == 0
            and bdf.exceptAll(a).count() == 0)
    out["verdicts_identical"] = bool(same)
    out["n"] = n
    out["k"] = k
    print(json.dumps({"metric": "semdedup store-bucket prune "
                                "(keyed replay)", **out}), flush=True)
    shutil.rmtree(root, ignore_errors=True)
    assert same, "pruned and unpruned verdict sinks diverge"


if __name__ == "__main__":
    main()
