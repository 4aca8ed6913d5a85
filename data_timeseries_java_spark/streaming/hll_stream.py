"""Streaming HyperLogLog distinct counting: each micro-batch persists
one DataSketches HLL per group (a sketch-sized binary row, not the
keys), and the read-time resolve max-merges the registers — lossless,
so the merged estimate EQUALS the single-shot batch sketch over the
concatenated input (the same property ``queries/scale.q_hll_user_
rollup`` proves for daily rollups). The incremental-cardinality shape
at 100 TB: per-trigger state is O(groups x sketch size) regardless of
key cardinality or stream length, and history folds losslessly.

Stream==batch equality is the test contract
(``tests/test_streaming_topk.py::test_streaming_hll_matches_single_shot``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def streaming_hll_distinct(spark: SparkSession, events: DataFrame,
                           work_dir: str, key_col: str = "user_id",
                           group_col: str = "event_type"):
    """Start the streaming sketch; returns the StreamingQuery. Each
    batch writes one ``batch_id`` partition of (group, hll_sketch)
    rows (overwrite → idempotent under foreachBatch retries). Resolve
    with :func:`read_streaming_hll`."""
    store = f"{work_dir}/hll"

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        (batch_df.groupBy(group_col)
         .agg(F.hll_sketch_agg(key_col).alias("sk"))
         .write.mode("overwrite").parquet(f"{store}/batch_id={batch_id}"))

    return (events.writeStream
            .foreachBatch(process_batch)
            .option("checkpointLocation", f"{work_dir}/checkpoint")
            .trigger(availableNow=True)
            .start())


def read_streaming_hll(spark: SparkSession, work_dir: str,
                       group_col: str = "event_type") -> DataFrame:
    """Union the per-batch sketches per group and estimate — register
    max-merge is lossless, so this equals the batch single-shot sketch
    over the whole stream."""
    store = f"{work_dir}/hll"
    df = spark.read.option("basePath", store).parquet(store)
    return (df.groupBy(group_col)
            .agg(F.hll_sketch_estimate(F.hll_union_agg("sk"))
                 .alias("distinct_est")))
