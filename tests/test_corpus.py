"""Corpus-pipeline invariants beyond the oracle hashes: leakage-safety
of the group split and pack-size bounds for sequence packing."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_timeseries_java_spark.queries import all_queries
from data_timeseries_java_spark.queries.corpus import PACK_BUDGET


def test_no_dup_group_straddles_splits(spark, sf_dir):
    split = all_queries()["leakage_safe_split"](spark, sf_dir)
    per_group = split.groupBy("group_id").agg(
        F.count_distinct("split").alias("n_splits"),
        F.count(F.lit(1)).alias("n_docs"))
    assert per_group.where(F.col("n_splits") > 1).count() == 0
    # the fixture corpus actually has multi-doc groups, so the
    # invariant is exercised, not vacuous
    assert per_group.where(F.col("n_docs") > 1).count() > 0


def test_pack_sizes_bounded_and_contiguous(spark, sf_dir):
    packs = all_queries()["sequence_packing"](spark, sf_dir).collect()
    by_source: dict[str, list] = {}
    for r in packs:
        by_source.setdefault(r.source, []).append(r)
    assert by_source
    from data_timeseries_java_spark.operators.text import tokens
    from data_timeseries_java_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    totals = {r.source: r.t for r in docs.groupBy("source").agg(
        F.sum(F.size(tokens(F.col("text")))).alias("t")).collect()}
    for source, rows in by_source.items():
        rows.sort(key=lambda r: r.pack_id)
        # pack ids are dense from 0 (start offsets tile the token stream)
        assert [r.pack_id for r in rows] == list(range(len(rows))), source
        # no token lost or double-packed
        assert sum(r.total_tokens for r in rows) == totals[source], source
        # doc ranges must not overlap between consecutive packs
        for a, b in zip(rows, rows[1:]):
            assert a.last_doc < b.first_doc, source


def test_funnel_last_stage_equals_corpus_build(spark, sf_dir):
    """The attrition report's final survivor count must equal the
    actual corpus_build output row count — the funnel is an
    observability VIEW of the same decisions, not a reimplementation
    that can drift."""
    from data_timeseries_java_spark.queries import all_queries

    qs = all_queries()
    funnel = {r.stage: r for r in qs["corpus_funnel"](spark, sf_dir).collect()}
    built = qs["corpus_build"](spark, sf_dir).count()
    assert funnel["decontamination"].n_out == built
    # monotone: every stage's n_out <= n_in, chained
    order = ["quality", "language", "dedup_keeper", "decontamination"]
    for a, b in zip(order, order[1:]):
        assert funnel[b].n_in == funnel[a].n_out
        assert funnel[b].n_out <= funnel[b].n_in


def test_chunk_documents_coverage_and_overlap(spark, sf_dir):
    """Chunk invariants the value-hash oracle can't express directly:
    (a) consecutive chunks of a doc overlap by exactly `overlap`
    tokens (except a shorter final chunk, which still starts at its
    stride offset), (b) concatenating each chunk's non-overlap prefix
    plus the final chunk reconstructs the document's token stream —
    i.e. full coverage, nothing skipped or duplicated beyond the
    declared overlap."""
    from data_timeseries_java_spark.operators.corpus import (
        chunk_documents,
    )
    from data_timeseries_java_spark.tables import load_table

    chunk, overlap = 16, 4
    stride = chunk - overlap
    docs = load_table(spark, sf_dir, "documents")
    rows = (chunk_documents(docs, chunk_tokens=chunk, overlap=overlap)
            .collect())
    toks = {r.doc_id: [t for t in r.text.lower().split(" ") if t]
            for r in docs.select("doc_id", "text").collect()}
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == {d for d, t in toks.items() if t}
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_idx)
        t = toks[doc_id]
        rebuilt = []
        for i, c in enumerate(chunks):
            assert c.start_tok == i * stride
            piece = c.chunk_text.split(" ") if c.chunk_text else []
            assert len(piece) == c.n_tokens <= chunk
            assert piece == t[c.start_tok:c.start_tok + c.n_tokens]
            rebuilt += piece if i == len(chunks) - 1 else piece[:stride]
        assert rebuilt == t, f"doc {doc_id} not reconstructed"
        # a multi-chunk doc's final chunk must carry more than the
        # pure-overlap tail (the no-degenerate-tail rule)
        if len(chunks) > 1:
            assert chunks[-1].n_tokens > overlap
