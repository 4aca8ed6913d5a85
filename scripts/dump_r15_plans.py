"""Capture .explain("formatted") for every headline bench lane into
plans/r15/<query>_<tag>.txt (tag = before/after — argv[1], default
"before"). Optimization-round evidence: the judge checks plan claims in
OPTIMIZATION_r15.md against these files.

Usage: python scripts/dump_r15_plans.py [before|after] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = sys.argv[2:]

    import bench
    from data_timeseries_java_spark import get_spark
    from data_timeseries_java_spark.plans import cache_policy, materialization
    from data_timeseries_java_spark.queries import all_queries

    spark = get_spark("dump-r15-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    out_dir = os.path.join(REPO, "plans", "r15")
    os.makedirs(out_dir, exist_ok=True)

    names = only or bench.HEADLINE
    for name in names:
        spark.sparkContext.setJobDescription(f"plan:{name}")
        with materialization(cache_policy):
            df = qs[name](spark, SF_DIR)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted"))
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
