"""SparkSession factory with scale-oriented defaults.

Local test/bench runs use ``local[$SPARK_GRAFT_CPUS]``; on a real cluster
the same configs apply (AQE, UTC session time, Arrow). Shuffle partitions
default to 32 locally — on a 1000-executor cluster set
``spark.sql.shuffle.partitions`` to 2-3x total cores (AQE coalesces down).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS = {
    # Belt-and-suspenders, NOT load-bearing (round 11): every operator
    # is posture-independent — corr goes through safe_corr
    # (functions/stats.py) and divisions carry nullif/try guards — and
    # the test suite runs with ANSI ON to keep it that way. Classic
    # mode stays the session default because on a zero-variance group
    # classic corr returns NULL (vs ANSI's raise), which the engine's
    # correlation policy classifies together with the reference's NaN
    # (ComputeCorrelationsDoFn.java:188-193: commons-math3 returns NaN
    # for flat series rather than erroring — downstream uniformly
    # checks `r IS NULL OR isnan(r)`), and because ANSI's
    # fail-fast casts are the wrong default for a batch engine over
    # dirty 100 TB inputs; a user embedding the operators in an ANSI
    # session gets identical results, not a raise.
    "spark.sql.ansi.enabled": "false",
    # Adaptive query execution: runtime re-plan, partition coalescing,
    # skew-join splitting — essential at 100 TB where static planning
    # can't see real partition sizes.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # All timestamps are event-time data; pin UTC so collected values are
    # zone-independent (the reference's goldens were minted in a default
    # zone — SURVEY.md §2.9.6 — we refuse to repeat that).
    "spark.sql.session.timeZone": "UTC",
    # Arrow for any pandas_udf / toPandas path.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Small dims (instruments, nation, region) should broadcast.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Parquet vectorized reader + pushdown are on by default; keep them.
    # (A lower spark.sql.files.openCostInBytes was tried for the
    # small-but-CPU-heavy text scans and measured INEFFECTIVE: parquet
    # parallelism is row-group-bound, and a single-row-group file stays
    # one task no matter how small the byte splits — the real lever is
    # the writer's row-group size, covered in SCALE.md §storage.)
    "spark.sql.parquet.filterPushdown": "true",
    # 32 MB scan splits (round 14; env-overridable below): the decade
    # replica dirs are single ~500 MB parquet files with ~30 MB row
    # groups, so the stock 128 MB splits hand a CPU-heavy mapInPandas
    # scan (semdedup assignment: measured 5 tasks on 32 cores) a 3-6x
    # parallelism haircut. On a real cluster the input has thousands
    # of splits either way; the smaller split size only adds
    # scheduling overhead proportional to file count, which AQE
    # coalescing absorbs downstream.
    "spark.sql.files.maxPartitionBytes": os.environ.get(
        "SPARK_GRAFT_MAX_PARTITION_BYTES", str(32 * 1024 * 1024)),
    # Pin BLAS threads INSIDE Python workers (round 14): every sf0.1
    # table is a single <=11 MB file so task counts are small, but the
    # local OpenBLAS (MAX_THREADS=2) still spawns a 2-thread pool per
    # worker — 32 workers x 2 threads oversubscribes the box. A/B on a
    # quiesced box (round-14 optimization session): pinned subset sum
    # 14.6 s vs unpinned 19.3 s; media_jpeg_decode median 0.69 s pinned
    # vs 3.82 s unpinned. At the 1000x decade the effect is larger
    # (semdedup Gram kernel ~32 ns/entry pinned vs ~350 ns/entry
    # oversubscribed). On a cluster with one core per task the pin is
    # standard practice. SPARK_GRAFT_WORKER_BLAS_PIN=0 lifts it for
    # single-task-heavy local debugging.
    **({"spark.executorEnv.OPENBLAS_NUM_THREADS": "1",
        "spark.executorEnv.OMP_NUM_THREADS": "1",
        "spark.executorEnv.MKL_NUM_THREADS": "1"}
       if os.environ.get("SPARK_GRAFT_WORKER_BLAS_PIN", "1") == "1" else {}),
    "spark.ui.showConsoleProgress": "false",
    "spark.ui.enabled": "false",
}


def get_spark(app_name: str = "data-timeseries-spark",
              master: str | None = None,
              shuffle_partitions: int | None = None,
              extra_conf: dict | None = None) -> SparkSession:
    """Create (or fetch) the engine's SparkSession.

    Env knobs: ``SPARK_GRAFT_CPUS`` (local parallelism, default 32),
    ``SPARK_GRAFT_MASTER`` (override master URL).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get(
            "SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))

    builder = (SparkSession.builder.appName(app_name).master(master)
               .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
               .config("spark.driver.memory",
                       os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")))
    for k, v in _DEFAULTS.items():
        builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, str(v))
    return builder.getOrCreate()
