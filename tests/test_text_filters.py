"""Gopher filter / collocation / source-overlap invariants beyond the
oracle hash (internal consistency the SQL mirror shares by
construction, so a bug in both engines would pass the oracle but
fail here)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from data_timeseries_java_spark.operators.text import (
    collocation_pmi,
    gopher_rules,
    source_ngram_overlap,
)
from data_timeseries_java_spark.tables import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").cache()


def test_gopher_keep_is_conjunction_and_splits(spark, docs):
    rows = gopher_rules(docs).collect()
    assert rows
    for r in rows:
        assert r.keep == (r.ok_word_count and r.ok_mean_len
                          and r.ok_alpha and r.ok_stopwords)
        assert 0.0 <= r.alpha_ratio <= 1.0
    kept = sum(r.keep for r in rows)
    # the thresholds must actually discriminate on this corpus —
    # an all-pass or all-fail filter would be a vacuous test
    assert 0 < kept < len(rows)


def test_collocation_pmi_identity_on_counts(spark, docs):
    """PMI recomputed from the row's own counts must equal the pmi
    column (guards against count-column/pmi drift), and every pair
    must meet the min-count floor."""
    rows = collocation_pmi(docs, min_count=5).collect()
    assert rows
    toks = docs.select(F.filter(F.split(F.lower("text"), " "),
                                lambda t: t != "").alias("t"))
    n1 = toks.select(F.sum(F.size("t"))).first()[0]
    n2 = toks.select(
        F.sum(F.greatest(F.size("t") - 1, F.lit(0)))).first()[0]
    for r in rows:
        assert r.c_xy >= 5
        assert r.c_x >= r.c_xy and r.c_y >= r.c_xy
        expect = math.log((r.c_xy * n1 * n1) / (n2 * r.c_x * r.c_y))
        assert math.isclose(r.pmi, round(expect, 6), abs_tol=1e-6)


def test_source_overlap_bounds(spark, docs):
    rows = source_ngram_overlap(docs).collect()
    n_sources = docs.select("source").distinct().count()
    assert len(rows) == n_sources * (n_sources - 1) // 2  # all pairs
    for r in rows:
        assert 0 <= r.n_inter <= min(r.n_a, r.n_b)
        assert r.n_union == r.n_a + r.n_b - r.n_inter
        assert 0.0 <= r.jaccard <= 1.0
        assert math.isclose(r.jaccard, round(r.n_inter / r.n_union, 6),
                            abs_tol=1e-9)
