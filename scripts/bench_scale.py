"""Scaling study: the four headline heavy queries at sf0.1 (1x) and
.scale10x (10x), median of 5 steady-state trials each. Prints a table
for SCALE.md §measured-slopes."""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = ["dedup_minhash_lsh", "corpus_build", "ann_lsh",
           "fx_pair_correlation"]


def bench(spark, qs, name, sf_dir, n=5):
    trials = []
    for i in range(n + 1):
        df = qs[name](spark, sf_dir)
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        if i:
            trials.append(time.time() - t0)
    return statistics.median(trials)


def main() -> None:
    from data_timeseries_java_spark import get_spark
    from data_timeseries_java_spark.queries import all_queries
    from data_timeseries_java_spark.tables import load_table

    spark = get_spark("bench-scale")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    one = "/root/testdata/sf0.1"
    ten = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".scale10x")
    for d in (one, ten):
        for t in ("events", "documents", "embeddings"):
            load_table(spark, d, t).count()
    print(f"{'query':24s} {'1x':>8s} {'10x':>8s} {'ratio':>6s}")
    for name in QUERIES:
        t1 = bench(spark, qs, name, one)
        t10 = bench(spark, qs, name, ten)
        print(f"{name:24s} {t1:8.3f} {t10:8.3f} {t10 / t1:6.2f}")


if __name__ == "__main__":
    main()
