"""Stage-level profile of the flagship semantic_dedup at a decade dir.

Times each stage of operators.similarity.semantic_dedup_autok
separately (count, sample collect, driver Lloyd's, assignment scan,
verdict join) via the round-14 composable stage functions, so perf
work targets the measured wall, not the assumed one. Usage:

    python scripts/profile_semdedup_1000x.py [dir] [coarse_cells]

coarse_cells: omit for auto, 0 forces the dense assignment kernel.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from data_timeseries_java_spark import get_spark
    from data_timeseries_java_spark.operators import similarity as OS
    from data_timeseries_java_spark.queries.similarity import (
        FIXEDK_K, KMEANS_ITERS, SAMPLE_PER_K, SEMDEDUP_T, SRP_BAND_BITS,
        _srp_signs, derived_tcs)
    from data_timeseries_java_spark.tables import load_table

    d = sys.argv[1] if len(sys.argv) > 1 else ".scale1000x"
    coarse = int(sys.argv[2]) if len(sys.argv) > 2 else None
    spark = get_spark("profile-semdedup")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, d, "embeddings")

    t0 = time.time()
    n = emb.count()
    t_count = time.time() - t0
    tcs = derived_tcs(n)
    k = max(FIXEDK_K, n // tcs)
    print(f"n={n} tcs={tcs} k={k} S={SAMPLE_PER_K * k} "
          f"coarse={coarse}", flush=True)

    t0 = time.time()
    cent_ids, W = OS.semdedup_train(emb, k, SAMPLE_PER_K * k,
                                    KMEANS_ITERS)
    t_train = time.time() - t0

    t0 = time.time()
    assign = OS.semdedup_assign(emb, cent_ids, W, _srp_signs(),
                                band_bits=SRP_BAND_BITS,
                                coarse_cells=coarse)
    n_assigned = assign.count()
    t_assign = time.time() - t0

    t0 = time.time()
    out = OS.semdedup_verdicts(emb, assign, threshold=SEMDEDUP_T)
    out.write.format("noop").mode("overwrite").save()
    t_verdict = time.time() - t0
    total = t_count + t_train + t_assign + t_verdict
    print(f"count={t_count:.2f}s train={t_train:.2f}s "
          f"assign={t_assign:.2f}s ({n_assigned} rows) "
          f"verdict={t_verdict:.2f}s TOTAL={total:.2f}s", flush=True)


if __name__ == "__main__":
    main()
