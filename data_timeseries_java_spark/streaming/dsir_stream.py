"""Streaming DSIR model building: each micro-batch of documents
persists one (bucket, ct, cr) hashed-ngram count partial — integer
sums, so the read-time merge is LOSSLESS: the summed model equals the
single-shot batch model exactly, and scoring with it reproduces
``operators/text.dsir_importance`` bit-for-bit (the gram/scoring code
is literally shared — ``_dsir_grams``/``_dsir_llr``/``_dsir_score``).

The incremental-selection shape at 100 TB: per-trigger state is
O(n_buckets) regardless of corpus size or stream length (the same
mergeable-store family as the CMS/HLL/grid-quantile stores), the model
is re-resolved whenever selection runs, and re-scoring is a batch pass
with a broadcast 1024-row table.

Stream==batch equality is the driver gate (``dsir_stream_replay``
hash-matches the batch ``dsir_importance`` oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401  (callers' predicates)

from data_timeseries_java_spark.operators.text import (
    _dsir_counts,
    _dsir_grams,
    _dsir_llr,
    _dsir_score,
)


def streaming_dsir_model(spark: SparkSession, docs: DataFrame,
                         work_dir: str, target: Column,
                         n_buckets: int = 1024,
                         text_col: str = "text",
                         id_col: str = "doc_id"):
    """Start the streaming model builder; returns the StreamingQuery.
    Each batch writes one ``batch_id`` partition of (bucket, ct, cr)
    rows (overwrite → idempotent under foreachBatch retries). Resolve
    with :func:`read_streaming_dsir`."""
    store = f"{work_dir}/dsir"

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        gb = _dsir_grams(batch_df, target, n_buckets, text_col, id_col)
        (_dsir_counts(gb)
         .write.mode("overwrite").parquet(f"{store}/batch_id={batch_id}"))

    return (docs.writeStream
            .foreachBatch(process_batch)
            .option("checkpointLocation", f"{work_dir}/checkpoint")
            .trigger(availableNow=True)
            .start())


def read_streaming_dsir(spark: SparkSession, work_dir: str,
                        docs: DataFrame, target: Column,
                        n_buckets: int = 1024, smoothing: float = 1.0,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Merge the per-batch count partials into THE model (integer sums
    — lossless) and score ``docs`` with it. Output contract identical
    to ``dsir_importance``."""
    store = f"{work_dir}/dsir"
    partials = spark.read.option("basePath", store).parquet(store)
    stats = (partials.groupBy("bucket")
             .agg(F.sum("ct").alias("ct"), F.sum("cr").alias("cr")))
    w = _dsir_llr(stats, n_buckets, smoothing)
    gb = _dsir_grams(docs, target, n_buckets, text_col, id_col)
    return _dsir_score(docs, gb, w, target, id_col)
