"""Streaming quantile estimation: a mergeable fixed-grid histogram
sketch, completing the streaming sketch family (CMS heavy hitters,
HLL distinct, grid quantiles).

Each micro-batch appends its per-(group, bin) histogram counts to a
log-structured store; counts are plain sums, so the merged grid equals
the single-shot histogram over the concatenated input and the resolve
is exact-with-respect-to-the-sketch (error bounded by one bin width —
the standard equi-width-histogram quantile trade, chosen over GK/KLL
here because a FIXED grid is bit-reproducible in any SQL engine, which
is what lets the driver gate hash-match the resolve instead of taking
an error-bound's word for it).

State per batch: at most groups x n_bins count rows + one geometry
meta row (the reader refuses a store whose geometry disagrees with the
caller's, same contract as the CMS store). No per-value state; memory
is O(groups x bins) regardless of stream length.

Reference parity note: the reference has no sketch tier; this extends
the engine's mergeable-sketch family to streams (SURVEY.md §2.7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _bin(v: F.Column, lo: float, hi: float, n_bins: int) -> F.Column:
    return F.least(
        F.lit(n_bins - 1),
        F.greatest(F.lit(0), F.floor((v - F.lit(lo)) * F.lit(n_bins)
                                     / F.lit(hi - lo)).cast("int")))


def streaming_grid_quantiles(spark: SparkSession, events: DataFrame,
                             work_dir: str, group_col: str = "event_type",
                             value_col: str = "value",
                             lo: float = 0.0, hi: float = 256.0,
                             n_bins: int = 256):
    """Start the streaming histogram; returns the StreamingQuery.
    Values are clamped into [lo, hi); each batch overwrites its own
    ``batch_id`` partition (idempotent under foreachBatch retries)."""
    store = f"{work_dir}/gridq"

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        grid = (batch_df
                .select(F.col(group_col).alias("grp"),
                        _bin(F.col(value_col), lo, hi, n_bins)
                        .alias("bin"))
                .groupBy("grp", "bin")
                .agg(F.count(F.lit(1)).alias("c")))
        meta = spark.createDataFrame(
            [("meta", None, -1, 0, float(lo), float(hi), n_bins)],
            "kind string, grp string, bin int, c bigint, "
            "lo double, hi double, n_bins int")
        out = (grid.select(F.lit("grid").alias("kind"), "grp", "bin", "c",
                           F.lit(None).cast("double").alias("lo"),
                           F.lit(None).cast("double").alias("hi"),
                           F.lit(None).cast("int").alias("n_bins"))
               .unionByName(meta))
        out.write.mode("overwrite").parquet(f"{store}/batch_id={batch_id}")

    return (events.writeStream
            .foreachBatch(process_batch)
            .option("checkpointLocation", f"{work_dir}/checkpoint")
            .trigger(availableNow=True)
            .start())


def read_streaming_quantiles(spark: SparkSession, work_dir: str,
                             qs: list[float] = (0.5, 0.9, 0.99),
                             lo: float | None = None,
                             hi: float | None = None,
                             n_bins: int | None = None) -> DataFrame:
    """Resolve the store: sum the grid partials, then per (group,
    quantile) take the smallest bin whose cumulative count reaches
    q x total; estimate = lo + (bin + 0.5) x bin_width. Geometry comes
    from the store's meta rows; passing lo/hi/n_bins ASSERTS them."""
    from pyspark.sql import Window

    from data_timeseries_java_spark.streaming.logstore import active

    store = f"{work_dir}/gridq"
    df = active(spark.read.option("basePath", store).parquet(store), "c")
    meta = (df.where(F.col("kind") == "meta")
            .select("lo", "hi", "n_bins").distinct().collect())
    if len(meta) != 1:
        raise ValueError(
            f"quantile store at {store} has {len(meta)} distinct grid "
            f"geometries; expected exactly one (lo, hi, n_bins)")
    s_lo, s_hi, s_bins = float(meta[0][0]), float(meta[0][1]), int(meta[0][2])
    for name, asked, got in (("lo", lo, s_lo), ("hi", hi, s_hi),
                             ("n_bins", n_bins, s_bins)):
        if asked is not None and asked != got:
            raise ValueError(f"store was written with {name}={got}, "
                             f"reader asked for {asked}")
    width = (s_hi - s_lo) / s_bins
    grid = (df.where(F.col("kind") == "grid")
            .groupBy("grp", "bin").agg(F.sum("c").alias("c")))
    tot = grid.groupBy("grp").agg(F.sum("c").alias("total"))
    cum = grid.select(
        "grp", "bin", "c",
        F.sum("c").over(Window.partitionBy("grp").orderBy("bin")
                        .rowsBetween(Window.unboundedPreceding, 0))
        .alias("cc"))
    qrows = F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q")
    cand = (cum.join(F.broadcast(tot), "grp")
            .select("grp", "bin", "cc", "total", qrows)
            .where(F.col("cc") >= F.col("q") * F.col("total")))
    sel = cand.groupBy("grp", "q").agg(F.min("bin").alias("bin"),
                                       F.first("total").alias("total"))
    return sel.select(
        F.col("grp"), F.col("q"),
        F.col("total").cast("long").alias("n"),
        F.round(F.lit(s_lo) + (F.col("bin") + F.lit(0.5)) * F.lit(width), 6)
        .alias("estimate"))


def compact_gridq_store(spark: SparkSession, work_dir: str) -> dict:
    """Fold the store's ACTIVE partials into one (bin counts sum;
    geometry meta rides through). Same crash-safe mechanics as
    ``compact_topk_store`` via ``streaming/logstore.py``: fold at
    ``max_seen + FOLD_OFFSET`` (resumed-stream collision-proof),
    ``kind='fold'`` supersession rows carried forward (superseded ids
    ride in the bigint ``c`` column — ``bin`` is too narrow for fold
    ids above FOLD_OFFSET), atomic temp-dir swap-in before removals."""
    import os

    from data_timeseries_java_spark.streaming.logstore import (
        FOLD_OFFSET,
        local_store_path,
        swap_in_fold,
    )

    store = local_store_path(work_dir, "gridq", "compact_gridq_store")
    batches = sorted(d for d in os.listdir(store)
                     if d.startswith("batch_id="))
    if len(batches) <= 1:
        return {"batches_before": len(batches),
                "batches_after": len(batches)}
    df = spark.read.option("basePath", store).parquet(store)
    prior_sup = {int(r[0]) for r in
                 df.where(F.col("kind") == "fold").select("c").collect()}
    act = (df.where(~F.col("batch_id").isin(list(prior_sup)))
           if prior_sup else df)
    grid = (act.where(F.col("kind") == "grid")
            .groupBy("grp", "bin").agg(F.sum("c").alias("c")))
    ids = sorted(int(b.split("=", 1)[1]) for b in batches)
    supersedes = sorted(prior_sup | set(ids))
    null_geo = [F.lit(None).cast("double").alias("lo"),
                F.lit(None).cast("double").alias("hi"),
                F.lit(None).cast("int").alias("n_bins")]
    sup_rows = spark.createDataFrame(
        [("fold", None, None, i) for i in supersedes],
        "kind string, grp string, bin int, c bigint")
    folded = (grid.select(F.lit("grid").alias("kind"), "grp", "bin", "c",
                          *null_geo)
              .unionByName(act.where(F.col("kind") == "meta")
                           .select("kind", "grp", "bin", "c",
                                   "lo", "hi", "n_bins").distinct())
              .unionByName(sup_rows.select("kind", "grp", "bin", "c",
                                           *null_geo)))
    swap_in_fold(folded, store, max(ids) + FOLD_OFFSET, batches)
    return {"batches_before": len(batches), "batches_after": 1}
