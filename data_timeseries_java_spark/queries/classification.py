"""Machine-readable scale classification of every declared query
(round-12 VERDICT #4).

THE NAMING INVARIANT: a default-sounding (unsuffixed) query name MUST
route to the scale path — the implementation that survives a 100x
scale-up. Lanes whose cost is super-linear BY DESIGN (exact /
brute-force ground-truth companions kept for recall evaluation and
small-corpus accuracy work) are DECLARED_BASELINES: each carries a
distinguishing suffix where artifact continuity allows, and always a
machine-readable entry here pointing at the scale path a production
user should reach instead. tests/test_plans.py asserts totality —
every name in the live registry is classified, so a new query cannot
ship unadjudicated — and that every baseline's scale-path pointers
resolve to declared queries.

Round-11 lesson (why this module exists): the unsuffixed
``semantic_dedup`` spent two rounds routing to a pinned-k path whose
within-cluster verify space was n²/k — correct and fast at the oracle
SFs, a 17-minute kill at the 100x decade. The default name is the one
a user reaches for; it must be the one that scales. Round 12 made the
flagship derive k from corpus size and codified the rule here.

Adjudications under the invariant (VERDICT #4 asked for these two by
name):

- ``neardup_cosine`` / ``neardup_cosine_auto``: within-label ALL-PAIRS
  cosine — Σ block² with block size ∝ n (498 s at the 100x decade,
  measured round 11). Kept under their historical names as the
  ground-truth control that ann_recall_eval and the LSH lanes are
  graded against; renaming would break the r01-r11 correctness/bench
  artifact continuity keyed by these names, so the machine-readable
  tag here is the declared mechanism (the invariant's stated
  alternative to a suffix). Their docstrings and SCALE.md carry the
  same adjudication.
- ``dedup_ngram_jaccard``: exact n-gram-intersection join — the
  intersection-size control for the MinHash estimate. Same
  continuity reasoning; scale path is dedup_minhash_lsh.
"""

from __future__ import annotations

# name -> (why it is super-linear by design, tuple of scale-path names
# a production user should reach instead)
DECLARED_BASELINES: dict[str, tuple[str, tuple[str, ...]]] = {
    "knn_bruteforce": (
        "exact top-k over the full corpus per query — the ANN "
        "ground truth (linear in n for a bounded query set, but the "
        "constant is the whole corpus per query)",
        ("ann_lsh", "ann_ivf", "ann_ivf_trained")),
    "neardup_cosine": (
        "within-label all-pairs cosine (Σ block², block ∝ n) — "
        "brute-force near-dup ground truth",
        ("ann_lsh", "tfidf_neardup", "semantic_dedup")),
    "neardup_cosine_auto": (
        "same all-pairs semantics through the measured pandas/BLAS "
        "kernel dispatcher",
        ("ann_lsh", "tfidf_neardup", "semantic_dedup")),
    "dedup_ngram_jaccard": (
        "exact n-gram intersection join — the intersection-size "
        "control the MinHash estimate is graded against",
        ("dedup_minhash_lsh",)),
    "semantic_dedup_exact": (
        "corpus-trained k-means (k ~ n trainer, O(n·k·d)/iteration) "
        "+ exact nearest-centroid assignment — the accuracy companion",
        ("semantic_dedup",)),
    "semantic_dedup_fixedk": (
        "pinned k ⇒ within-cluster verify space n²/k — the "
        "constant-cost small-corpus variant (killed at the 100x "
        "decade; round-11 VERDICT)",
        ("semantic_dedup",)),
    "semantic_dedup_ann": (
        "k ~ n corpus-trained centroids (quadratic TRAINER term) "
        "with linear SRP assignment — the trainer-cost companion",
        ("semantic_dedup",)),
}


def is_scale_path(name: str) -> bool:
    """True when ``name`` is claimed safe at 100x — the default for
    every declared query not listed in DECLARED_BASELINES."""
    return name not in DECLARED_BASELINES
