"""Streaming corpus build == batch corpus build on an append-ordered
feed, including the subtle dedup-before-filter case (a dup group whose
first arrival fails the quality gate must vanish entirely)."""

from __future__ import annotations

import glob
import os
import time as _time
from datetime import datetime, timedelta, timezone

from pyspark.sql import functions as F

from data_timeseries_java_spark.queries.corpus import q_corpus_build
from data_timeseries_java_spark.streaming.corpus_stream import (
    streaming_corpus_build,
)
from data_timeseries_java_spark.tables import load_table

SCHEMA = "doc_id long, ts timestamp, text string, lang string"
T0 = datetime(2024, 5, 1, 0, 0, tzinfo=timezone.utc)


def _augmented_docs(spark, sf_dir):
    """Real documents + planted rows: an exact dup of doc 60 arriving
    later (doc 900), a LOW-QUALITY doc (901) and a later exact dup of
    it (902) — the dup group whose keeper fails the gate."""
    docs = load_table(spark, sf_dir, "documents")
    base = [(r.doc_id, T0 + timedelta(seconds=int(r.doc_id)),
             r.text, r.lang)
            for r in docs.collect()]
    dup_src = next(r.text for r in docs.collect() if r.doc_id == 60)
    bad = "!!! ??? !!!"  # punctuation-only: quality score ~0
    extra = [(900, T0 + timedelta(seconds=2000), dup_src, "en"),
             (901, T0 + timedelta(seconds=2001), bad, "en"),
             (902, T0 + timedelta(seconds=2002), bad, "en")]
    return base + extra


def test_streaming_corpus_matches_batch(spark, sf_dir, tmp_path):
    d = str(tmp_path)
    rows = sorted(_augmented_docs(spark, sf_dir), key=lambda r: r[0])
    third = (len(rows) + 2) // 3
    base = _time.time() - 1000
    for i in range(3):
        chunk = rows[i * third:(i + 1) * third]
        spark.createDataFrame(chunk, SCHEMA).coalesce(1).write.mode(
            "overwrite").parquet(f"{d}/in/f{i}")
        for p in glob.glob(f"{d}/in/f{i}/*"):
            os.utime(p, (base + i * 10, base + i * 10))

    # batch expectation: q_corpus_build over the same augmented table
    # (written as a documents parquet so the declared query runs as-is)
    aug = spark.createDataFrame(rows, SCHEMA).select(
        "doc_id", "text", "lang",
        F.length("text").cast("long").alias("n_chars"),
        F.lit("srcX").alias("source"))
    aug.write.mode("overwrite").parquet(f"{d}/batchtbl/documents.parquet")
    expected = sorted(map(tuple, q_corpus_build(
        spark, f"{d}/batchtbl").collect()))

    src = (spark.readStream.schema(SCHEMA)
           .option("maxFilesPerTrigger", 1).parquet(f"{d}/in/f*"))
    eval_docs = (spark.createDataFrame(rows, SCHEMA)
                 .where(F.col("doc_id") < 50).select("doc_id", "text"))
    q = streaming_corpus_build(spark, src, eval_docs, f"{d}/work")
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.read
                 .option("basePath", f"{d}/work/corpus")
                 .parquet(f"{d}/work/corpus")
                 .drop("batch_id").collect()))

    assert got == expected
    kept_ids = {t[0] for t in got}
    # planted rows: 900 deduped against 60; 901 fails quality; 902
    # deduped against the FAILING 901 (dedup-before-filter) — none kept
    assert not {900, 901, 902} & kept_ids
    assert len(got) > 100
