"""Streaming anomaly detection: prequential per-key z-score flagging.

The streaming face of `event_anomalies` (broadcast-stats z-score over
the batch table): each micro-batch is scored against the statistics of
all PRIOR batches only — the prequential (test-then-train) discipline,
which never lets an outlier inflate the variance it is judged against
within the same batch, and gives every flag a reproducible "stats as of
batch N-1" provenance.

State is a tiny per-(key, batch) moment store — (count, sum, sum of
squares) rows, mergeable by addition like the HLL sketches in
queries/scale.py — persisted as batch_id-partitioned parquet with
overwrite-on-replay idempotency (same pattern as streaming/pipeline.py:
a replayed batch rewrites its own stats partition and its own verdict
partition; its prior-stats read filters batch_id < N, so re-execution
is exact). Scale shape per batch: one groupBy of the batch, one
broadcast join of key-count-sized stats onto the batch scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def streaming_anomalies(spark: SparkSession, events: DataFrame,
                        work_dir: str, key_col: str = "event_type",
                        value_col: str = "value", z: float = 3.0,
                        min_prior_n: int = 10):
    """Start the stream; flagged rows land in ``{work_dir}/anomalies``
    as the event columns + (prior_n, prior_mean, prior_std), moment
    state in ``{work_dir}/stats``. A key is scored only once its prior
    history has ``min_prior_n`` observations. Returns the StreamingQuery."""
    stats_path = f"{work_dir}/stats"
    anomaly_path = f"{work_dir}/anomalies"

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        v = F.col(value_col)
        (batch_df.groupBy(key_col)
         .agg(F.count(F.lit(1)).alias("cnt"),
              F.sum(v).alias("s"),
              F.sum(v * v).alias("ss"))
         .write.mode("overwrite").parquet(f"{stats_path}/batch_id={batch_id}"))

        store = (spark.read.option("basePath", stats_path)
                 .parquet(stats_path)
                 .where(F.col("batch_id") < batch_id))
        prior = (store.groupBy(key_col)
                 .agg(F.sum("cnt").alias("prior_n"),
                      F.sum("s").alias("_s"),
                      F.sum("ss").alias("_ss"))
                 .withColumn("prior_mean", F.col("_s") / F.col("prior_n"))
                 .withColumn("prior_std", F.sqrt(F.greatest(
                     F.col("_ss") / F.col("prior_n")
                     - (F.col("_s") / F.col("prior_n")) ** 2, F.lit(0.0))))
                 .select(key_col, "prior_n", "prior_mean", "prior_std"))
        flagged = (batch_df.join(F.broadcast(prior), key_col)
                   .where((F.col("prior_n") >= min_prior_n)
                          & (F.col("prior_std") > 0)
                          & (F.abs(v - F.col("prior_mean"))
                             > z * F.col("prior_std"))))
        flagged.write.mode("overwrite").parquet(
            f"{anomaly_path}/batch_id={batch_id}")

    return (events.writeStream
            .foreachBatch(process_batch)
            .option("checkpointLocation", f"{work_dir}/checkpoint")
            .trigger(availableNow=True)
            .start())
