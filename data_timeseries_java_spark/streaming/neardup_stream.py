"""Streaming near-duplicate detection: MinHash-LSH against an
accumulating signature store.

The streaming face of `operators/dedup.minhash_lsh_dedup` for the
"documents arrive continuously" pipeline: each micro-batch is
signatured once, banded against everything seen so far, and flagged if
it near-matches any earlier document. Exact-dup streaming is state-store
sized (`dedup_stream.py`); near-dup state is the signature store — a
few dozen bytes per document, NOT the corpus — persisted as parquet so
it survives restarts and is shared by the batch face.

Semantics: a document is a near-duplicate if it shares an LSH band
bucket with, and its signature agrees (>= ``sim_threshold`` of lanes,
an unbiased Jaccard estimate) with, a PRECEDING document — an earlier
micro-batch, or a smaller id within the same batch. First arrival wins;
verdicts are never retracted (append-only streaming contract).

Scale shape per batch: shingle+signature is a narrow map + one groupBy
over the BATCH only; the store join is banded (hash join on
(band, bucket)) so no all-pairs stage ever materializes; writes are
batch_id-partitioned overwrites, so an at-least-once re-execution
replaces its own output (idempotent, same as streaming/pipeline.py).

Reference parity note: the reference has no dedup surface at all; this
extends SURVEY.md §2.7's training-data additions to streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_timeseries_java_spark.operators.dedup import (
    DEFAULT_BAND_SIZE,
    DEFAULT_NUM_HASHES,
    minhash_signatures,
    shingles,
)


def _banded(sigs: DataFrame, id_col: str, num_hashes: int,
            band_size: int) -> DataFrame:
    """(id, batch_id, band, bucket) rows from a signature frame."""
    from data_timeseries_java_spark.functions.hashing import md5_band_bucket

    n_bands = num_hashes // band_size
    bands = []
    for b in range(n_bands):
        cols = [F.col(f"sig_{b * band_size + j}") for j in range(band_size)]
        bands.append(F.struct(F.lit(b).alias("band"),
                              md5_band_bucket(cols).alias("bucket")))
    return (sigs.select(id_col, "batch_id",
                        F.explode(F.array(*bands)).alias("bb"))
            .select(id_col, "batch_id",
                    F.col("bb.band").alias("band"),
                    F.col("bb.bucket").alias("bucket")))


def streaming_neardup(spark: SparkSession, docs: DataFrame, work_dir: str,
                      text_col: str = "text", id_col: str = "doc_id",
                      num_hashes: int = DEFAULT_NUM_HASHES,
                      band_size: int = DEFAULT_BAND_SIZE,
                      sim_threshold: float = 0.5,
                      shingle_k: int = 2):
    """Start the stream; verdicts land in ``{work_dir}/verdicts`` as
    (doc_id, is_near_dup, dup_of), signatures in ``{work_dir}/signatures``.
    Returns the StreamingQuery."""
    sig_path = f"{work_dir}/signatures"
    verdict_path = f"{work_dir}/verdicts"

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sh = shingles(batch_df, text_col, id_col, k=shingle_k,
                      distinct=False)
        sigs = minhash_signatures(sh, id_col, num_hashes)
        sigs.write.mode("overwrite").parquet(
            f"{sig_path}/batch_id={batch_id}")

        store = spark.read.option("basePath", sig_path).parquet(sig_path)
        batch_sigs = store.where(F.col("batch_id") == batch_id)
        cur = _banded(batch_sigs, id_col, num_hashes, band_size).alias("cur")
        prev = _banded(store, id_col, num_hashes, band_size).alias("prev")
        precedes = (F.col("prev.batch_id") < F.col("cur.batch_id")) | (
            (F.col("prev.batch_id") == F.col("cur.batch_id"))
            & (F.col(f"prev.{id_col}") < F.col(f"cur.{id_col}")))
        cand = (cur.join(prev, (F.col("cur.band") == F.col("prev.band"))
                         & (F.col("cur.bucket") == F.col("prev.bucket"))
                         & precedes)
                .select(F.col(f"cur.{id_col}").alias("this_id"),
                        F.col(f"prev.{id_col}").alias("other_id"))
                .distinct())
        # unbiased Jaccard estimate: fraction of agreeing signature lanes
        a = batch_sigs.alias("a")
        b = store.alias("b")
        agree = sum(
            F.when(F.col(f"a.sig_{i}") == F.col(f"b.sig_{i}"), 1).otherwise(0)
            for i in range(num_hashes)) / F.lit(float(num_hashes))
        dup = (cand
               .join(a, cand.this_id == F.col(f"a.{id_col}"))
               .join(b, cand.other_id == F.col(f"b.{id_col}"))
               .where(agree >= sim_threshold)
               .groupBy("this_id")
               .agg(F.min("other_id").alias("dup_of")))
        verdicts = (batch_df.select(id_col)
                    .join(dup, F.col(id_col) == F.col("this_id"), "left")
                    .select(id_col,
                            F.col("dup_of").isNotNull().alias("is_near_dup"),
                            "dup_of"))
        verdicts.write.mode("overwrite").parquet(
            f"{verdict_path}/batch_id={batch_id}")

    return (docs.writeStream
            .foreachBatch(process_batch)
            .option("checkpointLocation", f"{work_dir}/checkpoint")
            .trigger(availableNow=True)
            .start())
