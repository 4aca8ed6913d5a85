"""Streaming corpus build: the full training-data pipeline (quality
gate + language agreement + exact dedup + benchmark decontamination)
over a document STREAM — documents are admitted to the corpus on
arrival instead of in a nightly batch.

Stage order matters: dedup runs FIRST (keyed state on the content hash,
`dropDuplicatesWithinWatermark`), then the stateless quality/language
projections filter the survivors. Filtering first would be cheaper on
state, but it would change semantics: if a dup group's first arrival
fails the quality gate, the batch build (`queries/corpus.q_corpus_build`)
drops the whole group (the keeper is filtered out, every other member
is still a non-keeper); dedup-first reproduces that — the failing first
arrival still occupies the dedup state, so later copies are suppressed,
not promoted. The streaming-equals-batch test pins exactly this case.

Decontamination runs per micro-batch in ``foreachBatch``: the eval set
is static, so each batch's k-gram overlap check is a self-contained
aggregation against the broadcast eval shingles (no cross-batch state),
with batch_id-partitioned idempotent writes like streaming/pipeline.py.

Semantics vs batch: identical output when every duplicate arrives
within the watermark horizon of its group's first arrival AND first
arrivals are the min-id keepers (the common append-ordered feed);
outside the horizon the stream re-admits content the batch build would
dedup — the standard watermark-bounded-state tradeoff, same as
streaming/dedup_stream.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_timeseries_java_spark.operators.dedup import ngram_contamination
from data_timeseries_java_spark.operators.text import (
    language_columns,
    quality_columns,
)


def streaming_corpus_build(spark: SparkSession, docs: DataFrame,
                           eval_docs: DataFrame, work_dir: str,
                           quality_min: float = 0.55,
                           time_col: str = "ts",
                           watermark: str = "1 hour",
                           decon_k: int = 5, decon_min_overlap: int = 3):
    """Start the stream; kept corpus rows (doc_id, predicted_lang,
    n_tokens, quality_score) land in ``{work_dir}/corpus`` partitioned
    by batch_id. ``eval_docs`` is the static benchmark set to
    decontaminate against. Returns the StreamingQuery."""
    deduped = (docs
               .withColumn("_content_hash", F.md5(F.lower(F.col("text"))))
               .withWatermark(time_col, watermark)
               .dropDuplicatesWithinWatermark(["_content_hash"])
               .drop("_content_hash"))
    qc = quality_columns("text")
    lc = language_columns("text", "lang")
    kept = (deduped.select(
        "doc_id", "text",
        qc["n_tokens"].alias("n_tokens"),
        qc["quality_score"].alias("quality_score"),
        lc["predicted_lang"].alias("predicted_lang"),
        lc["lang_match"].alias("lang_match"))
        .where((F.col("quality_score") >= quality_min)
               & F.col("lang_match")))

    corpus_path = f"{work_dir}/corpus"

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # eval docs themselves are never "contaminated" (they'd trivially
        # self-match); the batch build excludes them the same way
        eval_ids = eval_docs.select(F.col("doc_id").alias("_eval_id"))
        candidates = batch_df.join(
            eval_ids, batch_df.doc_id == F.col("_eval_id"), "left_anti")
        contaminated = ngram_contamination(
            candidates.select("doc_id", "text"), eval_docs,
            k=decon_k, min_overlap=decon_min_overlap).select("doc_id")
        clean = batch_df.join(F.broadcast(contaminated), "doc_id",
                              "left_anti")
        (clean.select("doc_id", "predicted_lang",
                      F.col("n_tokens").cast("long").alias("n_tokens"),
                      "quality_score")
         .write.mode("overwrite").parquet(f"{corpus_path}/batch_id={batch_id}"))

    return (kept.writeStream
            .foreachBatch(process_batch)
            .option("checkpointLocation", f"{work_dir}/checkpoint")
            .trigger(availableNow=True)
            .start())
