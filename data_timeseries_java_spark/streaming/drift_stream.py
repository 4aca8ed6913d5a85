"""Streaming PSI drift monitor: micro-batches of events are binned
against FIXED reference decile edges (fit offline — exactly how a
production drift monitor deploys) and each batch persists one integer
(etype, bin, c_ref, c_cmp) count partial. Integer sums merge
losslessly, so the resolved PSI equals the batch computation
bit-for-bit — the same mergeable-store family as the CMS/HLL/grid-
quantile/DSIR stores, with O(types x bins) state per trigger
regardless of stream length.

Stream==batch equality is the driver gate (``psi_stream_replay``
hash-matches the batch ``value_psi`` oracle). Derivation code is
literally shared with the batch query (``operators/drift.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401

from data_timeseries_java_spark.operators.drift import (
    psi_assemble,
    psi_bin_counts,
)


def streaming_psi_counts(spark: SparkSession, tagged: DataFrame,
                         edges: DataFrame, work_dir: str):
    """Start the streaming bin-counter; returns the StreamingQuery.
    ``tagged`` is a stream with (etype, value, is_ref); ``edges`` the
    static reference-edge frame. Each batch writes one ``batch_id``
    partition (overwrite → idempotent under foreachBatch retries)."""
    store = f"{work_dir}/psi"

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        (psi_bin_counts(batch_df, edges)
         .write.mode("overwrite").parquet(f"{store}/batch_id={batch_id}"))

    return (tagged.writeStream
            .foreachBatch(process_batch)
            .option("checkpointLocation", f"{work_dir}/checkpoint")
            .trigger(availableNow=True)
            .start())


def read_streaming_psi(spark: SparkSession, work_dir: str,
                       edges: DataFrame) -> DataFrame:
    """Merge the per-batch count partials (integer sums — lossless)
    and assemble the PSI report; output contract identical to the
    batch ``q_value_psi``."""
    store = f"{work_dir}/psi"
    partials = spark.read.option("basePath", store).parquet(store)
    merged = (partials.groupBy("etype", "bin")
              .agg(F.sum("c_ref").cast("long").alias("c_ref"),
                   F.sum("c_cmp").cast("long").alias("c_cmp")))
    return psi_assemble(merged, edges)
