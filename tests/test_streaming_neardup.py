"""Streaming near-dup: MinHash-LSH verdicts across micro-batches, with
first-arrival-wins precedence and an idempotent replayable store."""

from __future__ import annotations

import glob
import os
import time as _time

from pyspark.sql import functions as F

from data_timeseries_java_spark.streaming.neardup_stream import (
    streaming_neardup,
)

SCHEMA = "doc_id long, text string"

BASE_A = ("the quick brown fox jumps over the lazy dog while seven "
          "wizards brew strong potions behind ancient stone walls near "
          "the silver river crossing at dawn")
BASE_D = ("machine learning pipelines shuffle enormous parquet tables "
          "across thousand node clusters while adaptive query execution "
          "rebalances skewed partitions during the midnight batch window")


def test_streaming_neardup_across_batches(spark, tmp_path):
    d = str(tmp_path)
    f0 = [(0, BASE_A), (1, "completely unrelated text about cooking "
                           "pasta with fresh basil tomatoes and olive oil "
                           "in a small tuscan kitchen every sunday")]
    f1 = [(2, BASE_A.replace("dawn", "dusk")),   # near-dup of 0
          (3, BASE_D)]
    f2 = [(4, BASE_D.replace("midnight", "morning")),  # near-dup of 3
          (5, "fresh snow covered the high mountain passes as climbers "
              "waited patiently for the spring thaw to open the northern "
              "route toward the summit ridge")]
    base = _time.time() - 1000
    for i, rows in enumerate([f0, f1, f2]):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "overwrite").parquet(f"{d}/in/f{i}")
        for p in glob.glob(f"{d}/in/f{i}/*"):
            os.utime(p, (base + i * 10, base + i * 10))

    src = (spark.readStream.schema(SCHEMA)
           .option("maxFilesPerTrigger", 1).parquet(f"{d}/in/f*"))
    q = streaming_neardup(spark, src, f"{d}/work")
    q.awaitTermination(120)

    verdicts = {r.doc_id: (r.is_near_dup, r.dup_of)
                for r in spark.read.option("basePath", f"{d}/work/verdicts")
                .parquet(f"{d}/work/verdicts").collect()}
    assert verdicts[0] == (False, None)
    assert verdicts[1] == (False, None)
    assert verdicts[2] == (True, 0)
    assert verdicts[3] == (False, None)
    assert verdicts[4] == (True, 3)
    assert verdicts[5] == (False, None)

    # signature store holds one row per doc (a few lanes each), and a
    # restarted stream with no new files adds nothing (availableNow +
    # checkpoint replays cleanly)
    sigs = spark.read.option("basePath", f"{d}/work/signatures").parquet(
        f"{d}/work/signatures")
    assert sigs.count() == 6
    src2 = (spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1).parquet(f"{d}/in/f*"))
    q2 = streaming_neardup(spark, src2, f"{d}/work")
    q2.awaitTermination(120)
    assert spark.read.option("basePath", f"{d}/work/signatures").parquet(
        f"{d}/work/signatures").count() == 6


def test_streaming_neardup_matches_batch_face(spark, tmp_path):
    """One-batch stream == the batch operator's pair verdicts on the
    same corpus (same signatures, same banding)."""
    from data_timeseries_java_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        shingles,
    )

    d = str(tmp_path)
    rows = [(0, BASE_A), (1, BASE_A.replace("fox", "cat")),
            (2, BASE_D), (3, BASE_D.replace("tables", "files")),
            (4, "entirely different content about gardening tulips "
                "and pruning apple trees in the late autumn frost "
                "before the first winter storms arrive")]
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "overwrite").parquet(f"{d}/in/f0")

    src = (spark.readStream.schema(SCHEMA)
           .option("maxFilesPerTrigger", 1).parquet(f"{d}/in/f*"))
    q = streaming_neardup(spark, src, f"{d}/work")
    q.awaitTermination(120)
    stream_dups = {r.doc_id: r.dup_of
                   for r in spark.read.option(
                       "basePath", f"{d}/work/verdicts")
                   .parquet(f"{d}/work/verdicts")
                   .where(F.col("is_near_dup")).collect()}

    docs = spark.createDataFrame(rows, SCHEMA)
    sigs = minhash_signatures(shingles(docs, k=2, distinct=False))
    pairs = lsh_candidate_pairs(sigs)
    batch_dups = {r.id_b: r.id_a for r in pairs.groupBy("id_b").agg(
        F.min("id_a").alias("id_a")).collect()}
    # every streamed dup is a batch candidate pair with the same keeper
    assert stream_dups == {k: v for k, v in batch_dups.items()
                           if k in stream_dups}
    assert stream_dups == {1: 0, 3: 2}
