"""Multimodal columns: opaque binary payloads with typed metadata.

Images/audio/video ride through the engine as ``binary`` columns plus a
metadata struct (modality, byte size, content hash). The Spark-side
plumbing — schema, partition-friendly layout, Arrow-batched UDF
signatures, batch shapes — is real and tested; the actual codec step is
stubbed (image/audio libraries are not in this container) behind a
deterministic fake that any real decoder (PIL, torchaudio, ffmpeg)
drops into.

Decode/feature-extract run as ``mapInPandas`` (per-partition Arrow
batches): at 100 TB this is the right shape — the binary column never
leaves the executor, batches amortize Python crossing, and partition
sizing (``spark.sql.files.maxPartitionBytes``) bounds memory per task.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("modality", T.StringType(), False),
    T.StructField("byte_len", T.LongType(), False),
    T.StructField("content_md5", T.StringType(), False),
])

FEATURE_SCHEMA = ("media_id long, modality string, byte_len long, "
                  "width int, height int, n_frames int, feature array<float>")


def attach_binary_metadata(df: DataFrame, payload_col: str = "payload",
                           id_col: str = "media_id") -> DataFrame:
    """Typed metadata for an opaque binary column — all JVM built-ins."""
    return df.select(
        F.col(id_col),
        F.col(payload_col),
        F.octet_length(F.col(payload_col)).cast("long").alias("byte_len"),
        F.md5(F.col(payload_col)).alias("content_md5"),
    )


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as a fake media payload so the
    binary plumbing is exercised on real testdata."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("image").alias("modality"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int, list[float]]:
    """STUB codec: deterministic fake decode. A real deployment replaces
    this with PIL/torchaudio/ffmpeg; everything around it (batching,
    schema, partitioning) is production-shaped.

    Raises NotImplementedError for modalities a real codec would own if
    payload is None (no bytes to decode).
    """
    if payload is None:
        raise NotImplementedError("real codec required for empty payload")
    n = len(payload)
    width = 16 + n % 64
    height = 16 + (n // 64) % 64
    n_frames = 1
    # 8-dim "feature": byte histogram over 8 buckets, L1-normalized
    hist = [0.0] * 8
    for by in payload:
        hist[by % 8] += 1.0
    total = sum(hist) or 1.0
    return width, height, n_frames, [h / total for h in hist]


def decode_features(media: DataFrame) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batch iterator).
    Batch shape: input/output pandas DataFrames per partition chunk."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                w, h, nf, feat = _fake_decode(r["payload"])
                rows.append({
                    "media_id": r["media_id"],
                    "modality": r["modality"],
                    "byte_len": len(r["payload"]),
                    "width": w, "height": h, "n_frames": nf,
                    "feature": feat,
                })
            yield pd.DataFrame(rows, columns=[
                "media_id", "modality", "byte_len", "width", "height",
                "n_frames", "feature"])

    return media.mapInPandas(run, FEATURE_SCHEMA)


RESIZE_SCHEMA = ("media_id long, modality string, width int, height int, "
                 "resized binary")
FRAMES_SCHEMA = ("media_id long, frame_idx int, frame_ts_ms long, "
                 "frame binary")


def resize_images(media: DataFrame, width: int = 224,
                  height: int = 224) -> DataFrame:
    """Resize stub: real deployments drop PIL's resize into `_resize`.
    The deterministic fake truncates/pads the payload to width*height/64
    bytes so batch shapes and schemas are exercised for real."""
    import pandas as pd

    target = max(1, width * height // 64)

    def _resize(payload: bytes) -> bytes:
        if payload is None:
            raise NotImplementedError("real codec required")
        return (payload * (target // max(len(payload), 1) + 1))[:target]

    def run(batches):
        for pdf in batches:
            out = pd.DataFrame({
                "media_id": pdf["media_id"],
                "modality": pdf["modality"],
                "width": width, "height": height,
                "resized": pdf["payload"].map(_resize),
            })
            yield out

    return media.mapInPandas(run, RESIZE_SCHEMA)


def sample_frames(media: DataFrame, n_frames: int = 4,
                  frame_interval_ms: int = 1000) -> DataFrame:
    """Frame-sampling stub (video → n evenly spaced frames). The fake
    slices the payload into n chunks; a real decoder (ffmpeg) replaces
    `_frames`. One input row → n output rows, the real fan-out shape."""
    import pandas as pd

    def _frames(payload: bytes):
        if payload is None:
            raise NotImplementedError("real codec required")
        step = max(1, len(payload) // n_frames)
        return [payload[i * step:(i + 1) * step] or payload[-step:]
                for i in range(n_frames)]

    def run(batches):
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                for i, fr in enumerate(_frames(r["payload"])):
                    rows.append({
                        "media_id": r["media_id"],
                        "frame_idx": i,
                        "frame_ts_ms": i * frame_interval_ms,
                        "frame": fr,
                    })
            yield pd.DataFrame(rows, columns=[
                "media_id", "frame_idx", "frame_ts_ms", "frame"])

    return media.mapInPandas(run, FRAMES_SCHEMA)
