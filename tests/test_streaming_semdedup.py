"""Streaming SemDeDup gate (round 13): the one identity that licenses
its oracle — id-range replay precedence makes the stream reproduce the
batch derived-k flagship EXACTLY, so the flagship's DuckDB SQL covers
the streaming lane verbatim."""

from __future__ import annotations

import pandas as pd


def _frame(df) -> pd.DataFrame:
    return (df.toPandas()
            .sort_values("vec_id").reset_index(drop=True)
            .astype({"vec_id": "int64", "centroid_id": "int64"}))


def test_stream_matches_batch_flagship(spark, sf_dir):
    """Every verdict column equal, row for row, between the streaming
    gate and the batch ``semantic_dedup`` flagship on the same corpus
    — offline-trained derived-k centroids, SRP assignment, within-
    cluster keep-lowest-id cosine verdicts; the stream's
    earlier-batch-or-smaller-id precedence collapses to plain vec_id
    order under id-range bucketing."""
    from data_timeseries_java_spark.queries.similarity import (
        q_semantic_dedup,
        q_semantic_dedup_stream_replay,
    )

    stream = _frame(q_semantic_dedup_stream_replay(spark, sf_dir))
    batch = _frame(q_semantic_dedup(spark, sf_dir))
    assert len(stream) == len(batch) > 0
    pd.testing.assert_frame_equal(stream, batch, check_dtype=False)


def test_stream_unassigned_kept_and_batches_cover_corpus(spark, sf_dir):
    """Cluster -1 rows (no band collision) are kept with null dup
    metadata — the safe under-dedup direction — and the 3 replay
    batches together cover every vector exactly once."""
    from data_timeseries_java_spark.queries.similarity import (
        q_semantic_dedup_stream_replay,
    )
    from data_timeseries_java_spark.tables import load_table

    v = q_semantic_dedup_stream_replay(spark, sf_dir).toPandas()
    n = load_table(spark, sf_dir, "embeddings").count()
    assert len(v) == n
    assert v["vec_id"].is_unique
    un = v[v["centroid_id"] == -1]
    assert bool(un["is_kept"].all())
    assert un["dup_of"].isna().all()
    assert un["max_dup_cos"].isna().all()
