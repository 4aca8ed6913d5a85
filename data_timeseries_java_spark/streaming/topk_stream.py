"""Streaming count-min-sketch heavy hitters: per micro-batch, write a
PARTIAL sketch (the batch's depth x width counter grid contributions
plus its top-M candidate keys with their batch counts) to a
log-structured store; resolve at read time by SUMMING the grid partials
— CMS counters are plain sums, so the merged grid is BIT-IDENTICAL to
the batch sketch over the concatenated input (``operators/skew.
cms_heavy_hitters`` with the same md5 lanes) — and estimating every
candidate against the merged grid.

State is bounded by construction: each batch persists depth x width
grid cells + at most ``candidates_per_batch`` candidate rows,
independent of stream length or key cardinality; ``compact_topk_store``
folds history into one partial (grids sum, candidate unions dedupe), so
the store stays O(depth x width + distinct candidates).

Approximation contract (inherited from every bounded-memory top-k):
the ESTIMATES are exact CMS over the full stream; the CANDIDATE
enumeration can miss a key that is globally heavy but never prominent
within any single batch (never in a batch's top-M). With M comfortably
above k (default 8x) this is the standard space-saving trade;
``candidates_per_batch=None`` keeps every key seen (exact candidate
recall, candidate-linear state — the right setting when per-batch key
cardinality is modest).

Reference parity note: the reference has no sketch tier at all; this
pairs the engine's batch sketch family (CMS / HLL / GK) with the
streaming lane. Stream==batch equality is the test contract
(``tests/test_streaming_topk.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Fold-id offset + supersession + atomic swap-in live in
# streaming/logstore.py (shared with the grid-quantile store); see its
# module docstring for the two crash/collision hazards they close.
from data_timeseries_java_spark.streaming.logstore import (  # noqa: E402
    FOLD_OFFSET as _FOLD_OFFSET,
)
from data_timeseries_java_spark.streaming.logstore import (  # noqa: E402
    active as _ls_active,
)
from data_timeseries_java_spark.streaming.logstore import (  # noqa: E402
    local_store_path,
    swap_in_fold,
)


def _superseded_ids(df: DataFrame) -> list[int]:
    """Superseded batch ids (fold rows carry them in ``bucket``)."""
    return [int(r[0]) for r in
            df.where(F.col("kind") == "fold").select("bucket").collect()]


def _active(df: DataFrame) -> DataFrame:
    return _ls_active(df, "bucket")


def _bucket(key: F.Column, r: F.Column, width: int) -> F.Column:
    """Same md5 lane as the batch sketch (skew.cms_heavy_hitters):
    first 8 md5 hex chars of "r:key" mod width."""
    return (F.conv(F.substring(
        F.md5(F.concat_ws(":", r, key)), 1, 8),
        16, 10).cast("long") % width)


def streaming_cms_topk(spark: SparkSession, events: DataFrame,
                       work_dir: str, key_col: str = "user_id",
                       depth: int = 4, width: int = 256,
                       candidates_per_batch: int | None = 160):
    """Start the streaming sketch; returns the StreamingQuery.

    Each micro-batch appends ONE ``batch_id`` partition holding its
    grid contributions (rows tagged kind='grid') and its candidate
    counts (kind='cand', top ``candidates_per_batch`` keys by batch
    count). Overwrite-per-batch keeps foreachBatch retries idempotent.
    Read the current top-k with :func:`read_streaming_topk`."""
    store = f"{work_dir}/topk"

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        per_key = (batch_df.groupBy(F.col(key_col).cast("string")
                                    .alias("key"))
                   .agg(F.count(F.lit(1)).alias("n")))
        if candidates_per_batch is not None:
            cand = (per_key.orderBy(F.desc("n"), "key")
                    .limit(candidates_per_batch))
        else:
            cand = per_key
        rows = per_key.select(
            "key", "n",
            F.explode(F.array(*[F.lit(r) for r in range(depth)]))
            .alias("r"))
        grid = (rows.select(F.col("r"),
                            _bucket(F.col("key"), F.col("r"), width)
                            .alias("bucket"), "n")
                .groupBy("r", "bucket").agg(F.sum("n").alias("c")))
        # one meta row per batch pins the sketch geometry IN the store:
        # a reader resolving with a different depth/width would map
        # candidates to the wrong cells and return garbage silently
        meta = spark.createDataFrame(
            [("meta", None, depth, width, 0)],
            "kind string, key string, r int, bucket long, c bigint")
        out = (grid.select(F.lit("grid").alias("kind"),
                           F.lit(None).cast("string").alias("key"),
                           "r", "bucket", F.col("c"))
               .unionByName(cand.select(
                   F.lit("cand").alias("kind"), "key",
                   F.lit(None).cast("int").alias("r"),
                   F.lit(None).cast("long").alias("bucket"),
                   F.col("n").alias("c")))
               .unionByName(meta))
        out.write.mode("overwrite").parquet(f"{store}/batch_id={batch_id}")

    return (events.writeStream
            .foreachBatch(process_batch)
            .option("checkpointLocation", f"{work_dir}/checkpoint")
            .trigger(availableNow=True)
            .start())


def read_streaming_topk(spark: SparkSession, work_dir: str,
                        depth: int | None = None,
                        width: int | None = None,
                        k: int = 20) -> DataFrame:
    """Resolve the store to the current top-k: sum the grid partials
    (== the batch sketch's grid over the whole stream, counters are
    sums), estimate each DISTINCT candidate as min over its lanes, and
    rank. Output matches ``cms_heavy_hitters`` minus the exact-count
    columns (an unbounded stream has no exact counter).

    The sketch geometry comes from the store's own meta rows; passing
    ``depth``/``width`` merely ASSERTS them (ValueError on mismatch —
    resolving with the wrong geometry would silently map candidates to
    wrong cells)."""
    store = f"{work_dir}/topk"
    df = _active(spark.read.option("basePath", store).parquet(store))
    meta = (df.where(F.col("kind") == "meta")
            .select("r", "bucket").distinct().collect())
    if len(meta) != 1:
        raise ValueError(
            f"top-k store at {store} has {len(meta)} distinct sketch "
            f"geometries; expected exactly one (depth, width)")
    s_depth, s_width = int(meta[0][0]), int(meta[0][1])
    if depth is not None and depth != s_depth:
        raise ValueError(f"store was written with depth={s_depth}, "
                         f"reader asked for {depth}")
    if width is not None and width != s_width:
        raise ValueError(f"store was written with width={s_width}, "
                         f"reader asked for {width}")
    depth, width = s_depth, s_width
    grid = (df.where(F.col("kind") == "grid")
            .groupBy("r", "bucket").agg(F.sum("c").alias("c")))
    cands = (df.where(F.col("kind") == "cand")
             .select("key").distinct())
    lanes = cands.select(
        "key",
        F.explode(F.array(*[F.lit(r) for r in range(depth)])).alias("r"))
    lanes = lanes.select("key", "r",
                         _bucket(F.col("key"), F.col("r"), width)
                         .alias("bucket"))
    est = (lanes.join(F.broadcast(grid), ["r", "bucket"])
           .groupBy("key").agg(F.min("c").alias("cms_estimate")))
    return (est.orderBy(F.desc("cms_estimate"), "key").limit(k)
            .select("key",
                    F.col("cms_estimate").cast("long").alias("cms_estimate")))


def compact_topk_store(spark: SparkSession, work_dir: str) -> dict:
    """Fold the store's ACTIVE partials into one: grids sum cell-wise,
    candidate sets union (their stored per-batch counts are only
    enumeration hints — estimates always come from the merged grid).
    Same local-path contract as the correlation store's compactor.

    Crash-safe by construction:

    - the fold lands at ``batch_id = max_seen + _FOLD_OFFSET``, an id a
      checkpoint-resumed stream can never write (see ``_FOLD_OFFSET``);
    - it carries one ``kind='fold'`` row per superseded batch id
      (prior folds' supersession rows ride forward — their targets may
      still be on disk after an earlier crash), so a resolve that sees
      both the fold and its sources excludes the sources instead of
      double-counting;
    - it is staged in a dot-prefixed temp dir (invisible to parquet
      readers) and renamed into place atomically BEFORE the old batch
      dirs are removed — every crash point leaves a store that resolves
      to the correct totals."""
    import os

    store = local_store_path(work_dir, "topk", "compact_topk_store")
    batches = sorted(d for d in os.listdir(store)
                     if d.startswith("batch_id="))
    if len(batches) <= 1:
        return {"batches_before": len(batches),
                "batches_after": len(batches)}
    df = spark.read.option("basePath", store).parquet(store)
    prior_sup = set(_superseded_ids(df))
    active = (df.where(~F.col("batch_id").isin(list(prior_sup)))
              if prior_sup else df)
    grid = (active.where(F.col("kind") == "grid")
            .groupBy("r", "bucket").agg(F.sum("c").alias("c")))
    cand = (active.where(F.col("kind") == "cand")
            .groupBy("key").agg(F.sum("c").alias("c")))
    ids = sorted(int(b.split("=", 1)[1]) for b in batches)
    supersedes = sorted(prior_sup | set(ids))
    sup_rows = spark.createDataFrame(
        [("fold", None, None, i, 0) for i in supersedes],
        "kind string, key string, r int, bucket long, c bigint")
    folded = (grid.select(F.lit("grid").alias("kind"),
                          F.lit(None).cast("string").alias("key"),
                          "r", "bucket", "c")
              .unionByName(cand.select(
                  F.lit("cand").alias("kind"), "key",
                  F.lit(None).cast("int").alias("r"),
                  F.lit(None).cast("long").alias("bucket"), "c"))
              # geometry meta rides through compaction
              .unionByName(active.where(F.col("kind") == "meta")
                           .select("kind", "key", "r", "bucket", "c")
                           .distinct())
              .unionByName(sup_rows))
    swap_in_fold(folded, store, max(ids) + _FOLD_OFFSET, batches)
    return {"batches_before": len(batches), "batches_after": 1}
