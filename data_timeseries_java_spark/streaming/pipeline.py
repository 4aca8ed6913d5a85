"""End-to-end streaming FX pipeline: ticks → complete candles (keyed
state) → log returns → incremental sliding-window pairwise correlation.

Correlation is a second aggregation over the candle stream; instead of
fighting Spark's one-stateful-operator-per-query rule, the correlation
stage runs in ``foreachBatch`` as an INCREMENTAL batch computation — the
standard production pattern for "aggregate of an aggregate" streams:

1. each micro-batch of finalized candles writes its log returns to a
   batch_id-keyed partition of the returns store (overwrite, so an
   at-least-once re-execution replaces its own output — idempotent);
2. only the sliding windows TOUCHED by this batch are recomputed (a
   window's correlation is correct once all its candles arrived; late
   candles simply re-trigger their windows);
3. results upsert into a window-partitioned correlation store via
   dynamic partition overwrite — each slide's partition is replaced
   atomically, untouched windows are never rewritten.

At 100 TB the same shape holds: the recompute joins only the affected
windows' returns (partition-pruned scan), and the pair join inside one
window is the engine's normal correlation plan. On an ACID table format
(Delta/Iceberg) the upsert becomes MERGE; plain parquet here keeps the
container dependency-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_timeseries_java_spark.operators import (
    CorrelationConfig,
    pairwise_correlations,
)
from data_timeseries_java_spark.streaming.candles_stream import (
    streaming_complete_candles,
)


def _flat_candles_to_returns(candles: DataFrame) -> DataFrame:
    """Flat streaming candle schema → (key, time, value) log returns."""
    return (candles
            .where((F.col("open_ask") > 0) & (F.col("close_ask") > 0))
            .select(
                "key",
                (F.col("window_end") - F.expr("INTERVAL 1 MILLISECOND")).alias("time"),
                F.log(F.col("close_ask") / F.col("open_ask")).alias("value"),
            ))


def streaming_correlations(spark: SparkSession, ticks: DataFrame,
                           work_dir: str,
                           resolution: str = "120 seconds",
                           config: CorrelationConfig | None = None,
                           watermark: str = "0 seconds"):
    """Start the full streaming pipeline; returns the StreamingQuery.

    Results land in ``{work_dir}/correlations`` partitioned by
    ``w_start_ms``; the returns store lives in ``{work_dir}/returns``.
    """
    cfg = config or CorrelationConfig()
    returns_path = f"{work_dir}/returns"
    corr_path = f"{work_dir}/correlations"
    candles = streaming_complete_candles(ticks, resolution, watermark)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        rets = _flat_candles_to_returns(batch_df)
        if rets.isEmpty():
            return
        batch_windows = (rets
                         .select(F.window("time", cfg.window, cfg.slide).alias("w"))
                         .select(F.unix_millis("w.start").alias("w_start_ms"))
                         .distinct())
        # foreachBatch is at-least-once: a batch re-executed after a
        # failure must not double-append its returns (that would inflate
        # x_count/y_count in recomputed windows). Writing each batch to
        # its own batch_id partition with overwrite makes the retry
        # idempotent — the replay replaces its own output exactly.
        rets.write.mode("overwrite").parquet(
            f"{returns_path}/batch_id={batch_id}")

        all_rets = (spark.read
                    .option("basePath", returns_path)
                    .parquet(returns_path)
                    .drop("batch_id"))
        # cache_input=False: a fresh cache entry per micro-batch (the
        # returns store grows each batch → new plan) would accumulate
        corr = pairwise_correlations(all_rets, cfg, cache_input=False)
        affected = corr.withColumn(
            "w_start_ms", F.unix_millis("window_start")
        ).join(F.broadcast(batch_windows), "w_start_ms", "left_semi")
        (affected
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("w_start_ms")
         .parquet(corr_path))

    return (candles.writeStream
            .foreachBatch(process_batch)
            .option("checkpointLocation", f"{work_dir}/checkpoint")
            .trigger(availableNow=True)
            .start())
