"""Skew-resilient aggregation shapes.

At 100 TB a handful of hot keys (one viral page, one default user id)
can pin an entire stage on one reducer. Two mitigations, both pure
DataFrame plans:

- ``two_phase_distinct``: exact COUNT(DISTINCT v) per key without a
  single-reducer bottleneck. Phase 1 reduces on the FULL (key, value)
  pair — a hot key's rows spread across the cluster by value hash —
  phase 2 counts the already-reduced pairs per key. This is the classic
  skew-safe rewrite of count-distinct; it beats a single aggregation
  with Expand when the distinct-value space per hot key is large.

- ``salted_agg``: two-phase decomposable aggregation through an
  explicit salt column. Phase 1 pre-aggregates on (key, salt) so a hot
  key is split across ``n_salts`` reducers; phase 2 combines the
  per-salt partials. For plain sum/count/min/max Spark's map-side
  partial aggregation already achieves this — the machinery exists for
  aggregations whose per-key state does NOT reduce map-side
  (collect_set-like holistic state, large percentile state), and the
  decomposable case here is the oracle-checkable proof that the
  two-phase split is semantics-preserving.

No reference counterpart (the reference has no skewed workloads —
SURVEY.md §2.7); these are engine-grade additions for the
training-data-pipeline north star.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def two_phase_distinct(df: DataFrame, keys: list[str],
                       distinct_col: str,
                       out_col: str = "n_distinct") -> DataFrame:
    """Exact per-key distinct count as reduce-on-pair -> count-per-key.

    Both phases are full shuffles, but neither ever concentrates a hot
    key on one task: phase 1 partitions by hash(key, value), phase 2
    sees at most |distinct values| rows per key.
    """
    pairs = df.select(*keys, distinct_col).distinct()
    return pairs.groupBy(*keys).agg(F.count(F.lit(1)).alias(out_col))


def salted_agg(df: DataFrame, keys: list[str], salt_col: str | None,
               n_salts: int,
               partials: dict[str, tuple[Column, Column]]) -> DataFrame:
    """Two-phase aggregation through an explicit salt.

    ``partials`` maps output column name -> (phase-1 aggregate over raw
    rows, phase-2 combiner over the per-salt partial column of the same
    name). E.g. a global sum is ``(F.sum(c), F.sum(c))``; a count is
    ``(F.count(...), F.sum(c))``; min/max combine with themselves.

    ``salt_col`` must be high-cardinality-ish (a row id); the salt is
    ``pmod(hash(salt_col), n_salts)`` so plans stay deterministic.
    ``salt_col=None`` salts on ``monotonically_increasing_id`` for
    frames with no natural row id (still correct — partials of a
    decomposable aggregate combine regardless of how rows split — but
    the plan is no longer deterministic row-for-row).
    """
    salt_src = (F.monotonically_increasing_id() if salt_col is None
                else F.hash(F.col(salt_col)))
    salted = df.withColumn("_salt", F.pmod(salt_src, F.lit(n_salts)))
    phase1 = salted.groupBy(*keys, "_salt").agg(
        *[agg1.alias(name) for name, (agg1, _) in partials.items()])
    return phase1.groupBy(*keys).agg(
        *[agg2.alias(name) for name, (_, agg2) in partials.items()])


def cms_heavy_hitters(df: DataFrame, key_col: str,
                      depth: int = 4, width: int = 256,
                      k: int = 20) -> DataFrame:
    """Count-min-sketch heavy hitters: estimate per-key frequencies
    through a depth x width counter grid (bucket r = md5-lane hash of
    ``r:key`` mod width) and return the top-k keys by estimate.

    The sketch is the 100 TB shape: counter state is O(depth*width)
    regardless of key cardinality, it builds with ONE map-side-combining
    shuffle, and the tiny grid broadcasts back for estimation. CMS
    guarantees estimate >= exact (hash collisions only ever add), which
    the output carries as a checkable column next to the exact count —
    and because the hash is md5, an external SQL engine reproduces the
    ENTIRE sketch bit-for-bit (``queries/scale.py`` approx_topk_cms),
    so this is hash-checked end to end rather than claim-checked.

    Candidate enumeration uses the per-key aggregate (a production
    pipeline tracks candidates in a bounded heap instead; the sketch
    math is identical)."""
    per_key = df.groupBy(key_col).agg(F.count("*").alias("n_exact"))
    rows = per_key.select(
        key_col, "n_exact",
        F.explode(F.array(*[F.lit(r) for r in range(depth)])).alias("r"))
    bucket = (F.conv(F.substring(
        F.md5(F.concat_ws(":", F.col("r"), F.col(key_col))), 1, 8),
        16, 10).cast("long") % width).alias("bucket")
    rows = rows.select(key_col, "n_exact", "r", bucket)
    sketch = rows.groupBy("r", "bucket").agg(F.sum("n_exact").alias("c"))
    est = (rows.join(F.broadcast(sketch), ["r", "bucket"])
           .groupBy(key_col, "n_exact")
           .agg(F.min("c").alias("cms_estimate")))
    return (est.orderBy(F.desc("cms_estimate"), key_col).limit(k)
            .select(key_col,
                    F.col("cms_estimate").cast("long").alias("cms_estimate"),
                    F.col("n_exact").cast("long").alias("n_exact"),
                    (F.col("cms_estimate") >= F.col("n_exact"))
                    .alias("never_underestimates")))
