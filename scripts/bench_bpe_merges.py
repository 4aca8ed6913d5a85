"""Merge-chain scaling ceiling for BPE-as-replace-chain.

The committed mechanism (operators/text.bpe_apply) applies the ranked
merge table as a chain of built-in string replaces — whole-stage
codegen, no UDF. That is clean at 64 merges, but a production tokenizer
carries 32k-100k merges and a single nested expression tree cannot be
split by codegen (one replace nests inside the next), so somewhere the
generated method blows the JVM 64 KB limit and Spark silently falls
back to interpreted evaluation — and Catalyst analysis cost itself
grows with tree depth.

This bench measures, at 64 / 256 / 1024 merges (prefixes of the
1024-rank table in functions/bpe_vocab_1k.py):
  - plan build+analysis time (df construction through .schema)
  - execution wall over sf0.1 documents (noop write)
  - generated-code size of the projection (explain 'codegen' capture),
    flagging when any single method's source exceeds 64 KB
for BOTH mechanisms:
  - direct: the chain applied to every document string (bpe_token_counts)
  - dict:   the chain applied to DISTINCT WORDS only, token counts
            broadcast-joined back (bpe_token_counts_dict) — the 100-TB
            shape: corpus cost is one explode + one broadcast join,
            chain cost is paid on the (Heaps-law bounded) vocabulary.
"""

from __future__ import annotations

import io
import os
import re
import statistics
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from data_timeseries_java_spark import get_spark
    from data_timeseries_java_spark.functions.bpe_vocab_1k import (
        MERGES as MERGES_1K)
    from data_timeseries_java_spark.operators.text import (
        bpe_token_counts,
        bpe_token_counts_dict,
    )
    from data_timeseries_java_spark.tables import load_table

    n_trials = int(os.environ.get("SPARK_GRAFT_TRIALS", "3"))
    sizes = [int(x) for x in os.environ.get(
        "SPARK_GRAFT_BPE_SIZES", "64,256,1024").split(",")]
    mechs = os.environ.get("SPARK_GRAFT_BPE_MECHS", "direct,dict").split(",")
    # MEASURED (r8): at 1024 merges the direct chain's depth-1024
    # expression tree overflows the JVM thread stack (StackOverflowError
    # in StringReplace.dataType recursion) and KILLS the local JVM —
    # the hard ceiling sits between 256 and 1024.  Kept out of the
    # default run; override to reproduce.
    direct_max = int(os.environ.get("SPARK_GRAFT_BPE_DIRECT_MAX", "256"))
    spark = get_spark("bench-bpe-merges")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, "/root/testdata/sf0.1", "documents").cache()
    docs.count()
    print(f"{'mech':8s}{'merges':>8s}{'plan_s':>9s}{'median_s':>10s}"
          f"{'gen_kb':>8s}{'max_method_kb':>15s}")
    for n in sizes:
        merges = MERGES_1K[:n]
        for mech, build in (
                ("direct", lambda m=merges: bpe_token_counts(
                    docs, merges=m)),
                ("dict", lambda m=merges: bpe_token_counts_dict(
                    docs, merges=m))):
            if mech not in mechs:
                continue
            if mech == "direct" and n > direct_max:
                note = "(skipped: JVM StackOverflowError, SCALE.md)"
                print(f"{mech:8s}{n:>8d}  {note}")
                continue
            t0 = time.time()
            df = build()
            df.schema  # force analysis
            plan_s = time.time() - t0
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("codegen")
            code = buf.getvalue()
            methods = re.split(r"\n(?=/\* \d+ \*/)", code)
            # size of each generated function body, approximated by
            # splitting on private/public method definitions
            bodies = re.split(r"private .*?\{|public .*?\{", code)
            max_kb = max((len(b) for b in bodies), default=0) / 1024
            ts = []
            for i in range(n_trials + 1):
                t0 = time.time()
                build().write.format("noop").mode("overwrite").save()
                if i:
                    ts.append(time.time() - t0)
            med = statistics.median(ts)
            print(f"{mech:8s}{n:>8d}{plan_s:>9.2f}{med:>10.3f}"
                  f"{len(code) / 1024:>8.0f}{max_kb:>15.0f}")
    docs.unpersist()


if __name__ == "__main__":
    main()
