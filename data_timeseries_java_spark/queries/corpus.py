"""End-to-end corpus build: the composed training-data pipeline a user
actually runs — quality gate + language agreement + exact-dedup keeper
+ benchmark decontamination, in one declarative plan.

Composition is the point: each stage is an already-oracle-checked
operator (text.quality_score, text.language_id, dedup.exact_duplicates,
dedup.ngram_contamination); this query chains them the way a real
pretraining corpus build does and hash-checks the COMBINED result, so
stage interfaces stay compatible. Everything is one lazy plan: the
document scan feeds four branches that reduce to doc-count-sized
frames, joined back semi/anti onto the id set — no iteration, no
driver actions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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
    contaminated against the doc_id < 50 eval set."""
    from data_timeseries_java_spark.operators.dedup import (
        exact_duplicates,
        ngram_contamination,
    )
    from data_timeseries_java_spark.operators.text import (
        language_id,
        quality_score,
    )

    docs = load_table(spark, sf_dir, "documents")
    q = quality_score(docs).where(F.col("quality_score") >= QUALITY_MIN)
    lang_ok = language_id(docs).where(F.col("lang_match")).select(
        "doc_id", "predicted_lang")
    keepers = (exact_duplicates(docs)
               .where(~F.col("is_duplicate")).select("doc_id"))
    contaminated = ngram_contamination(
        docs.where(F.col("doc_id") >= DECON_EVAL_MAX_ID),
        docs.where(F.col("doc_id") < DECON_EVAL_MAX_ID),
        k=DECON_K, min_overlap=DECON_MIN_OVERLAP).select("doc_id")
    return (q.join(lang_ok, "doc_id")
            .join(keepers, "doc_id", "left_semi")
            .join(contaminated, "doc_id", "left_anti")
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
