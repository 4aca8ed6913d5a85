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
    documents_as_media,
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


QUERIES = {
    "media_metadata": q_media_metadata,
    "media_decode_features": q_media_decode_features,
}

ORACLE = {
    "media_metadata": """
SELECT doc_id AS media_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
       md5(text) AS content_md5
FROM documents
""",
    # media_decode_features: no oracle — Python stub codec, rows-only check
}
