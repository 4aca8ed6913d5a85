"""Exploratory per-lane time-split probe (round 14): for each lane,
time (a) Python plan-build, (b) cold first noop action (Catalyst +
codegen + cache fill), (c) warm noop actions — so an optimization
targets the component that actually dominates (guide section 1).

Usage: python scripts/profile_lane_overhead.py lane [lane ...]
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as in bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from data_timeseries_java_spark import get_spark
    from data_timeseries_java_spark.plans import cache_policy, materialization
    from data_timeseries_java_spark.queries import all_queries
    from data_timeseries_java_spark.tables import load_tables

    spark = get_spark("profile-lane-overhead")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    for df in load_tables(spark, sf_dir).values():
        df.count()

    out = {}
    for name in sys.argv[1:]:
        spark.sparkContext.setJobDescription(f"profile:{name}")
        with materialization(cache_policy):
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            t_build = time.time() - t0
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t_cold = time.time() - t0
            warm = []
            for _ in range(3):
                df2 = qs[name](spark, sf_dir)
                t0 = time.time()
                df2.write.format("noop").mode("overwrite").save()
                warm.append(round(time.time() - t0, 3))
        out[name] = {"build": round(t_build, 3), "cold": round(t_cold, 3),
                     "warm": warm}
        print(name, json.dumps(out[name]), flush=True)
    spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
