"""End-to-end corpus build: the composed training-data pipeline a user
actually runs — quality gate + language agreement + exact-dedup keeper
+ benchmark decontamination, in one declarative plan.

Composition is the point: each stage's semantics are the
already-oracle-checked operators (text.quality_score, text.language_id,
dedup.exact_duplicates, dedup.ngram_contamination); this query fuses
them the way a real pretraining corpus build should — quality and
language-ID as columns of ONE document scan, the dup-keeper as a window
min over the content hash, decontamination as a broadcast anti-join —
and hash-checks the COMBINED result against the stage-by-stage oracle,
so the fusion is proven semantics-preserving. Everything is one lazy
plan: no iteration, no driver actions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_timeseries_java_spark.queries.dedup import (
    DECON_EVAL_MAX_ID,
    DECON_K,
    DECON_MIN_OVERLAP,
)
from data_timeseries_java_spark.queries.dedup import (
    ORACLE as _DEDUP_ORACLE,
)
from data_timeseries_java_spark.queries.text import _QUALITY_SQL, _langid_sql
from data_timeseries_java_spark.tables import load_table

QUALITY_MIN = 0.55


def q_corpus_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kept corpus documents: quality >= 0.55, predicted language agrees
    with the declared one, exact-duplicate keeper rows only, and not
    contaminated against the doc_id < 50 eval set.

    Fused plan: quality and language-ID are narrow column expressions
    (operators/text.py `quality_columns`/`language_columns`), so the
    main stream is ONE scan of `documents` projecting both plus the
    content hash, with the dup-keeper as a window min over the hash —
    no per-stage joins of doc-count frames on doc_id. Contamination is
    the only branch that re-reads text (its shingle stream has a
    different shape); its tiny output anti-joins back as a broadcast.
    Net: 2 scans + 1 window shuffle + the shingle groupBy, vs 6 scans
    and 3 doc-count joins for the naive stage-by-stage composition."""
    from data_timeseries_java_spark.operators.dedup import (
        ngram_contamination,
    )
    from data_timeseries_java_spark.operators.text import (
        language_columns,
        quality_columns,
    )

    docs = load_table(spark, sf_dir, "documents")
    qc = quality_columns("text")
    lc = language_columns("text", "lang")
    base = docs.select(
        "doc_id",
        qc["n_tokens"].alias("n_tokens"),
        qc["quality_score"].alias("quality_score"),
        lc["predicted_lang"].alias("predicted_lang"),
        lc["lang_match"].alias("lang_match"),
        F.md5(F.lower(F.col("text"))).alias("content_hash"))
    w = Window.partitionBy("content_hash")
    kept = (base
            .withColumn("keeper_id", F.min("doc_id").over(w))
            .where((F.col("quality_score") >= QUALITY_MIN)
                   & F.col("lang_match")
                   & (F.col("doc_id") == F.col("keeper_id"))))
    contaminated = ngram_contamination(
        docs.where(F.col("doc_id") >= DECON_EVAL_MAX_ID),
        docs.where(F.col("doc_id") < DECON_EVAL_MAX_ID),
        k=DECON_K, min_overlap=DECON_MIN_OVERLAP).select("doc_id")
    return (kept.join(F.broadcast(contaminated), "doc_id", "left_anti")
            .select("doc_id", "predicted_lang",
                    F.col("n_tokens").cast("long").alias("n_tokens"),
                    "quality_score"))


QUERIES = {"corpus_build": q_corpus_build}

ORACLE = {"corpus_build": f"""
WITH quality AS ({_QUALITY_SQL}),
langid AS ({_langid_sql()}),
dup AS ({_DEDUP_ORACLE["dedup_exact"]}),
contaminated AS ({_DEDUP_ORACLE["decontaminate"]})
SELECT q.doc_id, l.predicted_lang,
       CAST(q.n_tokens AS BIGINT) AS n_tokens, q.quality_score
FROM quality q
JOIN langid l ON l.doc_id = q.doc_id AND l.lang_match
JOIN dup d ON d.doc_id = q.doc_id AND NOT d.is_duplicate
WHERE q.quality_score >= {QUALITY_MIN}
  AND q.doc_id NOT IN (SELECT doc_id FROM contaminated)
"""}
