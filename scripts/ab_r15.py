"""Round-15 interleaved A/B probe: times OLD vs NEW shapes of the
lanes this round touched, alternating arms trial-by-trial in ONE
session so hypervisor steal waves (measured 0-12% in bursts on this
box — see OPTIMIZATION_r15.md §environment) hit both arms equally.
Reports per-arm median AND min; min is the contention-robust statistic
on this host.

Usage: python scripts/ab_r15.py <probe> [trials]
Probes: spans | verdictpin | video
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as in bench.py.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _spans_old(df, k=8, flag_frac=0.2, text_col="text", id_col="doc_id"):
    """The round-14 shape of duplicated_substring_spans: gram assembly
    via posexplode + lead window (one extra shuffle + sort of the
    token stream), verbatim from the r14 tree."""
    from pyspark.sql import Window

    from data_timeseries_java_spark.operators.dedup import _floor6
    from data_timeseries_java_spark.operators.text import tokens

    t = tokens(F.col(text_col))
    toks_e = df.select(F.col(id_col), F.posexplode(t).alias("pos", "tok"))
    wd = Window.partitionBy(id_col).orderBy("pos")
    gram = F.concat_ws(" ", F.col("tok"),
                       *[F.lead("tok", i).over(wd) for i in range(1, k)])
    grams = (toks_e.select(id_col, "pos", gram.alias("gram"),
                           F.lead("tok", k - 1).over(wd).alias("_lk"))
             .where(F.col("_lk").isNotNull()))
    gh = grams.select(id_col, "pos",
                      F.substring(F.md5("gram"), 1, 16).alias("h"))
    dpos = (gh.withColumn("c", F.count(F.lit(1))
                          .over(Window.partitionBy("h")))
            .where(F.col("c") >= 2).select(id_col, "pos"))
    lagp = F.lag("pos").over(wd)
    run = Window.partitionBy(id_col).orderBy("pos") \
        .rowsBetween(Window.unboundedPreceding, 0)
    isl = (dpos
           .withColumn("f", F.when(lagp.isNull()
                                   | (F.col("pos") - lagp > k - 1),
                                   1).otherwise(0))
           .withColumn("grp", F.sum("f").over(run)))
    spans = isl.groupBy(id_col, "grp").agg(
        F.min("pos").alias("s"),
        (F.max("pos") + (k - 1)).alias("e"),
        F.count(F.lit(1)).alias("n_grams_in"))
    per_doc = spans.groupBy(id_col).agg(
        F.sum("n_grams_in").cast("long").alias("n_dup_grams"),
        F.count(F.lit(1)).cast("long").alias("n_dup_spans"),
        F.sum(F.col("e") - F.col("s") + 1).cast("long")
        .alias("dup_tokens"),
        F.max(F.col("e") - F.col("s") + 1).cast("long")
        .alias("longest_span"))
    base = df.select(F.col(id_col), F.size(t).cast("long")
                     .alias("n_tokens"))
    dtok = F.coalesce(F.col("dup_tokens"), F.lit(0))
    frac = _floor6(dtok / F.greatest(F.col("n_tokens"), F.lit(1)))
    return (base.join(per_doc, id_col, "left")
            .select(id_col, "n_tokens",
                    F.coalesce(F.col("n_dup_grams"), F.lit(0))
                    .cast("long").alias("n_dup_grams"),
                    F.coalesce(F.col("n_dup_spans"), F.lit(0))
                    .cast("long").alias("n_dup_spans"),
                    dtok.cast("long").alias("dup_tokens"),
                    F.coalesce(F.col("longest_span"), F.lit(0))
                    .cast("long").alias("longest_span"),
                    frac.alias("dup_frac"),
                    (frac >= flag_frac).alias("flagged")))


def _video_fused(media):
    """The round-14 fused demux+decode mapInPandas (single stage)."""
    import numpy as np
    import pandas as pd

    from data_timeseries_java_spark.functions.avi import decode_avi_frames
    from data_timeseries_java_spark.functions.jpeg import decode_jpeg
    from data_timeseries_java_spark.operators.multimodal import (
        FRAME_STATS_SCHEMA)

    def run(batches):
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                for fi, frame in enumerate(decode_avi_frames(payload)):
                    px = decode_jpeg(frame)
                    h, w, _ch = px.shape
                    rows.append((int(mid), fi, w, h,
                                 int(px.sum(dtype=np.int64))))
            yield pd.DataFrame(rows, columns=[
                "media_id", "frame_idx", "width", "height", "pixel_sum"])

    return media.mapInPandas(run, FRAME_STATS_SCHEMA)


def main() -> None:
    probe = sys.argv[1]
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from data_timeseries_java_spark import get_spark
    from data_timeseries_java_spark.tables import load_table, load_tables

    spark = get_spark(f"ab-r15-{probe}")
    spark.sparkContext.setLogLevel("ERROR")
    for df in load_tables(spark, sf_dir).values():
        df.count()

    if probe == "spans":
        from data_timeseries_java_spark.operators.dedup import (
            duplicated_substring_spans)
        docs = load_table(spark, sf_dir, "documents")
        arms = {"old_window_gram": lambda: _spans_old(docs),
                "new_sliced_gram": lambda: duplicated_substring_spans(docs)}
    elif probe == "verdictpin":
        from data_timeseries_java_spark.queries.similarity import (
            FIXEDK_K, KMEANS_ITERS, SAMPLE_PER_K, SEMDEDUP_T,
            SRP_BAND_BITS, _srp_signs, derived_tcs)
        from data_timeseries_java_spark.operators.similarity import (
            semantic_dedup_autok)
        emb = load_table(spark, sf_dir, "embeddings")
        n = emb.count()
        k = max(FIXEDK_K, n // derived_tcs(n))

        def run_autok(hint):
            return semantic_dedup_autok(
                emb, k=k, signs=_srp_signs(),
                sample_size=SAMPLE_PER_K * k, iterations=KMEANS_ITERS,
                threshold=SEMDEDUP_T, band_bits=SRP_BAND_BITS,
                n_hint=hint)

        arms = {"old_pinned_64": lambda: run_autok(None),
                "new_adaptive": lambda: run_autok(n)}
    elif probe == "video":
        from data_timeseries_java_spark.operators.multimodal import (
            synthesize_avi_media, video_frame_stats)
        docs = load_table(spark, sf_dir, "documents")
        ids = docs.select(F.col("doc_id").alias("media_id"))
        ncpu = spark.sparkContext.defaultParallelism
        arms = {"old_fused": lambda: _video_fused(synthesize_avi_media(ids)),
                "split_pipelined": lambda: video_frame_stats(
                    synthesize_avi_media(ids)),
                "split_fanout": lambda: video_frame_stats(
                    synthesize_avi_media(ids), fanout=ncpu)}
    else:
        raise SystemExit(f"unknown probe {probe}")

    times: dict[str, list[float]] = {a: [] for a in arms}
    # one discarded warm-up per arm, then interleaved timed trials
    for name, build in arms.items():
        build().write.format("noop").mode("overwrite").save()
    for i in range(trials):
        for name, build in arms.items():
            df = build()
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            times[name].append(round(time.time() - t0, 3))
    for name, ts in times.items():
        print(f"{name:18s} median={statistics.median(ts):7.3f} "
              f"min={min(ts):7.3f} trials={ts}")


if __name__ == "__main__":
    main()
