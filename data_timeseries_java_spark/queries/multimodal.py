"""Multimodal-column queries over `documents` (text bytes as payloads).

`media_metadata` is fully oracle-checked (byte length / content hash are
engine-portable). `media_decode_features` exercises the mapInPandas
decode plumbing with the deterministic stub codec — it has no SQL
equivalent, so the driver records the weaker rows-only check for it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_timeseries_java_spark.operators.multimodal import (
    attach_binary_metadata,
    decode_features,
    decode_image_stats,
    documents_as_media,
    synthesize_png_media,
)
from data_timeseries_java_spark.tables import load_table


def q_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = documents_as_media(docs)
    return attach_binary_metadata(media).select(
        "media_id", "byte_len", "content_md5")


def q_media_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = documents_as_media(docs)
    feats = decode_features(media)
    return feats.select(
        "media_id", "modality", "byte_len", "width", "height", "n_frames",
        F.round(F.element_at("feature", 1).cast("double"), 6).alias("f0"),
    )


def q_media_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end REAL image path: synthesize a deterministic PNG per
    doc_id (genuine spec-conformant bytes), then decode it back with the
    pure-Python codec (zlib inflate + scanline unfilter) and report
    exact dimensions/channel-count/pixel-sum. The oracle recomputes the
    same stats in closed form from doc_id — a hash match proves the
    encoder and decoder agree on real pixel data, not stub output."""
    docs = load_table(spark, sf_dir, "documents")
    media = synthesize_png_media(
        docs.select(F.col("doc_id").alias("media_id")))
    return decode_image_stats(media)


QUERIES = {
    "media_metadata": q_media_metadata,
    "media_decode_features": q_media_decode_features,
    "media_png_decode": q_media_png_decode,
}

ORACLE = {
    "media_metadata": """
SELECT doc_id AS media_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
       md5(text) AS content_md5
FROM documents
""",
    # media_decode_features: no oracle — Python stub codec, rows-only check
    # media_png_decode: pixel recipe is closed-form in doc_id (see
    # synthesize_png_media) — width w = 4+id%13, height h = 3+id%7,
    # channels ch by id%3, pixel[r,*,*] = id%200 + r (never wraps), so
    # pixel_sum = ch * w * (h*base + h*(h-1)/2)
    "media_png_decode": """
SELECT doc_id AS media_id,
       CAST(4 + doc_id % 13 AS INT) AS width,
       CAST(3 + doc_id % 7 AS INT) AS height,
       CAST(CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END
            AS INT) AS channels,
       CAST((CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END)
            * (4 + doc_id % 13)
            * ((3 + doc_id % 7) * (doc_id % 200)
               + ((3 + doc_id % 7) * (3 + doc_id % 7 - 1)) // 2)
            AS BIGINT) AS pixel_sum
FROM documents
""",
}
