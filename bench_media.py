"""Media codec throughput bench: docs/s and MB/s for the pure-Python
codec tier (the engine's only Python-bound hot loop).

Methodology: payloads are synthesized ONCE and materialized to local
parquet, so the timed passes measure DECODE throughput (read → codec →
noop write), not the encoder. Each lane reports docs/s over the row
count and MB/s over the total compressed payload bytes; the large-image
lanes add megapixels/s, the honest per-pixel ceiling (the fixture-size
lanes are dominated by per-image Python overhead, not per-byte work).

Lanes mirror the four driver-gated media queries plus the pixel
ceiling:
  jpeg_decode   — baseline JPEG Huffman+IDCT (media_jpeg_decode's op)
  png_resize    — PNG decode → nearest resize → PNG re-encode
  wav_features  — PCM decode + waveform stats (media_wav_features)
  video_frames  — AVI demux + per-frame JPEG decode (media_video_frames)
  jpeg_128 / png_128 — 128x128 single-image decode (Mpx/s ceiling)

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_MEDIA_REPLICATE (default 1; 10 = the SCALE.md 10x point),
SPARK_GRAFT_TRIALS (default 3), SPARK_GRAFT_MEDIA_LANES (comma list —
run a lane subset for isolation bisection).

Prints ONE JSON line:
{"metric": "media codec throughput", "lanes": {name: {docs_per_s,
mb_per_s, payload_mb, n_docs, median_sec, ...}}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _materialize(df, path):
    df.write.mode("overwrite").parquet(path)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    replicate = int(os.environ.get("SPARK_GRAFT_MEDIA_REPLICATE", "1"))
    n_trials = int(os.environ.get("SPARK_GRAFT_TRIALS", "3"))

    from pyspark.sql import functions as F

    from data_timeseries_java_spark import get_spark
    from data_timeseries_java_spark.operators.multimodal import (
        audio_features,
        decode_image_stats,
        resize_images,
        synthesize_avi_media,
        synthesize_jpeg_pixel_media,
        synthesize_png_media,
        synthesize_wav_media,
        video_frame_stats,
    )
    from data_timeseries_java_spark.tables import load_table

    spark = get_spark("bench-media")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    ids = docs.select(F.col("doc_id").alias("media_id"))
    if replicate > 1:
        # distinct ids across replicas so codec inputs stay varied
        n0 = ids.count()
        ids = (ids.crossJoin(spark.range(replicate).select(
            F.col("id").alias("rep")))
            .select((F.col("media_id") + F.col("rep") * n0)
                    .alias("media_id")))

    def big_image_ids(n=500):
        # the pixel-ceiling lanes use fewer, larger images
        return spark.range(n * replicate).select(F.col("id").alias("media_id"))

    def synth_big(codec, ids_df):
        """128x128 row-gradient gray images — real entropy-coded data
        (the gradient keeps JPEG AC coefficients and PNG filters live)."""
        import numpy as np
        import pandas as pd

        from data_timeseries_java_spark.functions.jpeg import encode_jpeg
        from data_timeseries_java_spark.functions.png import encode_png

        def run(batches):
            for pdf in batches:
                payloads = []
                for mid in pdf["media_id"]:
                    i = int(mid)
                    col = ((i % 100 + np.arange(128)) % 256).astype(np.uint8)
                    img = np.broadcast_to(col[:, None], (128, 128)).copy()
                    payloads.append(encode_jpeg(img, quality=75)
                                    if codec == "jpeg" else
                                    encode_png(img[:, :, None]))
                yield pd.DataFrame({
                    "media_id": pdf["media_id"].astype("int64"),
                    "payload": payloads})

        return ids_df.mapInPandas(run, "media_id long, payload binary")

    def synth_long_avi(n_videos=8, n_frames=400):
        """FEW LARGE files — the shape where per-frame fan-out matters:
        n_videos MJPEG containers of n_frames 32x24 gradient frames
        each. Fused decode serializes each container into one task, so
        parallelism is capped at n_videos regardless of cluster width;
        video_frame_stats(fanout=N) spreads the frames."""
        import numpy as np
        import pandas as pd

        from data_timeseries_java_spark.functions.avi import (
            encode_avi_mjpeg)
        from data_timeseries_java_spark.functions.jpeg import encode_jpeg

        vids = spark.range(n_videos).select(F.col("id").alias("media_id"))

        def run(batches):
            for pdf in batches:
                payloads = []
                for mid in pdf["media_id"]:
                    i = int(mid)
                    frames = [encode_jpeg(np.full(
                        (24, 32), (i + 17 * f) % 256, dtype=np.uint8),
                        quality=75) for f in range(n_frames)]
                    payloads.append(encode_avi_mjpeg(frames, 32, 24, fps=10))
                yield pd.DataFrame({
                    "media_id": pdf["media_id"].astype("int64"),
                    "payload": payloads})

        return vids.repartition(n_videos).mapInPandas(
            run, "media_id long, payload binary")

    ncpu = spark.sparkContext.defaultParallelism
    work = tempfile.mkdtemp(prefix="bench_media_")
    lanes_def = [
        ("jpeg_decode", synthesize_jpeg_pixel_media(ids),
         lambda m: decode_image_stats(m), None),
        ("png_resize",
         synthesize_png_media(ids).withColumn("modality", F.lit("image")),
         lambda m: resize_images(m, 224, 224), None),
        ("wav_features", synthesize_wav_media(ids),
         lambda m: audio_features(m), None),
        ("video_frames", synthesize_avi_media(ids),
         lambda m: video_frame_stats(m), None),
        # round 15: few-large-files arms — fused (parallelism capped at
        # the container count) vs per-frame fan-out (guide §4)
        ("video_long_fused", synth_long_avi(),
         lambda m: video_frame_stats(m), None),
        ("video_long_fanout", synth_long_avi(),
         lambda m: video_frame_stats(m, fanout=ncpu), None),
        ("jpeg_128", synth_big("jpeg", big_image_ids()),
         lambda m: decode_image_stats(m), 128 * 128),
        ("png_128", synth_big("png", big_image_ids()),
         lambda m: decode_image_stats(m), 128 * 128),
    ]

    only = os.environ.get("SPARK_GRAFT_MEDIA_LANES")
    if only:
        keep = {x for x in only.split(",") if x}
        unknown = sorted(keep - {l[0] for l in lanes_def})
        if unknown:   # typo'd lane names must fail, not silently skip
            raise SystemExit(
                f"SPARK_GRAFT_MEDIA_LANES names unknown: {unknown}")
        lanes_def = [l for l in lanes_def if l[0] in keep]

    lanes: dict[str, dict] = {}
    try:
        for name, media, op, px_per_doc in lanes_def:
            path = f"{work}/{name}"
            _materialize(media, path)
            stored = spark.read.parquet(path)
            n_docs = stored.count()
            payload_bytes = stored.select(
                F.sum(F.octet_length("payload"))).first()[0]
            trials = []
            for t in range(n_trials + 1):  # trial 0 = warm-up, discarded
                df = op(spark.read.parquet(path))
                t0 = time.time()
                df.write.format("noop").mode("overwrite").save()
                if t > 0:
                    trials.append(round(time.time() - t0, 3))
            med = statistics.median(trials)
            row = {
                "n_docs": n_docs,
                "payload_mb": round(payload_bytes / 1e6, 3),
                "median_sec": round(med, 3),
                "docs_per_s": round(n_docs / med, 1),
                "mb_per_s": round(payload_bytes / 1e6 / med, 3),
                "trials": trials,
            }
            if px_per_doc:
                row["mpx_per_s"] = round(n_docs * px_per_doc / 1e6 / med, 3)
            lanes[name] = row
    finally:
        shutil.rmtree(work, ignore_errors=True)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps({
        "metric": "media codec throughput",
        "lanes": lanes,
        "replicate": replicate,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))


if __name__ == "__main__":
    main()
