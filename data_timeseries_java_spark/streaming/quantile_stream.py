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

    store = f"{work_dir}/gridq"
    df = spark.read.option("basePath", store).parquet(store)
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
