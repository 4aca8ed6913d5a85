"""Directed dedup semantics the synthetic corpus can't exercise:
containment scoring must surface doc-in-doc pairs whose Jaccard falls
below the near-dup threshold."""

from __future__ import annotations

from data_timeseries_java_spark.operators.dedup import (
    containment_dedup,
    minhash_lsh_dedup,
)

# A is a strict prefix of B (doc-in-doc): containment = 1.0 but word-
# bigram Jaccard ≈ 0.545 — under the 0.7 near-dup threshold. The pair
# is chosen so the deterministic md5 LSH banding (16 hashes, band size
# 4) actually collides on a band; MinHash banding recalls containment
# pairs only with probability driven by Jaccard, so an arbitrary
# embedded doc may not band-collide — that trade-off is documented on
# the operator.
_A = ("quebec victor november romeo hotel uniform whiskey four oscar "
      "zulu xray alpha mike")
_B = _A + " kilo two sierra lima echo charlie delta three one bravo"


def _docs(spark):
    return spark.createDataFrame(
        [(1, _A), (2, _B), (3, "tango golf india papa tango golf")],
        "doc_id long, text string")


def test_containment_catches_doc_in_doc(spark):
    out = containment_dedup(_docs(spark), k=2, threshold=0.8,
                            cache_plan=False).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.id_a, r.id_b) == (1, 2)
    assert r.containment == 1.0
    assert r.jaccard < 0.7        # Jaccard alone would have dropped it


def test_jaccard_threshold_misses_the_same_pair(spark):
    out = minhash_lsh_dedup(_docs(spark), k=2, threshold=0.7,
                            cache_plan=False).collect()
    assert out == []
