"""jaccard_prefix_join fourth-decade (1000x) measurement with a
disk-bounded, driver-sequential BATCHED verify (round-13, VERDICT r12
#4 completion path).

Why a special runner: the verify stage ships candidate x set-ARRAY
bytes — the Vernica/Carey/Li (SIGMOD 2010) verify shape at full width.
Measured at the 1000x replica decade: 409,306,897 candidate pairs
(exactly linear per decade: 409k / 4.09M / 40.9M / 409M), avg set 52.1
int64-hashed shingles -> ~341 GB of shuffled intermediate (after
round-13's 60-bit hashing already cut the string-domain stream ~4.9x,
and the size filter another 24%), against ~62 GB free on this box. A
1000-executor cluster spreads shuffle across local disks — the
single-box measurement needs the peak bounded instead.

Bounding trick: the verify join is embarrassingly partitionable by
candidate row — split candidates into N_BATCHES hash buckets on id_b
and run each bucket's verify as its OWN action, sequentially. Peak
shuffle footprint divides by N_BATCHES; total bytes and the RESULT
(union of disjoint buckets) are unchanged. A plan-level union would
NOT bound the peak — Spark's DAG scheduler submits independent stages
concurrently — hence the driver loop here rather than a flag on the
declared operator (whose single-plan shape stays the honest cluster
posture).

Prints one JSON line: per-batch walls, total, candidate/result counts.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_BATCHES = int(os.environ.get("SPARK_GRAFT_JAC_BATCHES", "12"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR") or os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scale1000x")
THRESHOLD, K = 0.5, 3


def main() -> None:
    import tempfile

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from data_timeseries_java_spark import get_spark
    from data_timeseries_java_spark.operators.dedup import shingles
    from data_timeseries_java_spark.tables import load_table

    spark = get_spark("jac1000x")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF_DIR, "documents")
    t_all = time.time()

    # --- candidate generation: same derivation as the operator ---
    sh = shingles(docs, "text", "doc_id", k=K)
    hsh = sh.select(
        "doc_id",
        F.conv(F.substring(F.md5("shingle"), 1, 15), 16, 10)
         .cast("long").alias("hs")).distinct()
    dfreq = hsh.groupBy("hs").agg(F.count(F.lit(1)).alias("_df"))
    ranked = (hsh.join(dfreq, "hs")
              .withColumn("_n", F.count(F.lit(1)).over(
                  Window.partitionBy("doc_id")))
              .withColumn("_pos", F.row_number().over(
                  Window.partitionBy("doc_id")
                  .orderBy(F.asc("_df"), F.asc("hs")))))
    prefix_len = (F.col("_n")
                  - F.ceil(F.round(F.col("_n") * THRESHOLD, 9)) + 1)
    pref = ranked.where(F.col("_pos") <= prefix_len)
    a = pref.select(F.col("doc_id").alias("id_a"), "hs",
                    F.col("_n").alias("_na"))
    b = pref.select(F.col("doc_id").alias("id_b"),
                    F.col("hs").alias("hs_b"), F.col("_n").alias("_nb"))
    cand = (a.join(b, (F.col("hs") == F.col("hs_b"))
                   & (F.col("id_a") < F.col("id_b")))
            .where(F.least("_na", "_nb")
                   >= F.round(F.greatest("_na", "_nb") * THRESHOLD, 9))
            .select("id_a", "id_b").distinct())

    work = tempfile.mkdtemp(prefix="jac1000x_")
    t0 = time.time()
    cand.write.mode("overwrite").parquet(f"{work}/cand")
    sets = hsh.groupBy("doc_id").agg(
        F.array_sort(F.collect_set("hs")).alias("sh_set"))
    sets.write.mode("overwrite").parquet(f"{work}/sets")
    t_cand = round(time.time() - t0, 1)
    cand_n = spark.read.parquet(f"{work}/cand").count()

    sets_pq = spark.read.parquet(f"{work}/sets")
    sa = sets_pq.select(F.col("doc_id").alias("id_a"),
                        F.col("sh_set").alias("sh_a"))
    sb = sets_pq.select(F.col("doc_id").alias("id_b"),
                        F.col("sh_set").alias("sh_b"))
    n_inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("long")
    n_union = (F.size("sh_a") + F.size("sh_b")).cast("long") - n_inter
    jac = n_inter / n_union

    batch_walls, total_rows = [], 0
    for i in range(N_BATCHES):
        t0 = time.time()
        part = (spark.read.parquet(f"{work}/cand")
                .where(F.pmod(F.xxhash64("id_b"), N_BATCHES) == i))
        out = (part.join(sa.hint("shuffle_hash"), "id_a")
               .join(sb.hint("shuffle_hash"), "id_b")
               .where(F.round(jac, 9) >= THRESHOLD)
               .count())
        total_rows += out
        batch_walls.append(round(time.time() - t0, 1))
        print(f"batch {i}: {batch_walls[-1]}s rows={out}", flush=True)

    print(json.dumps({
        "metric": "jaccard_prefix_join 1000x batched verify",
        "sf_dir": SF_DIR, "n_batches": N_BATCHES,
        "candidates": cand_n, "result_rows": total_rows,
        "cand_gen_sec": t_cand, "batch_walls": batch_walls,
        "total_sec": round(time.time() - t_all, 1),
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
