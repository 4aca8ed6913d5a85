"""Tick readers: batch parquet/CSV/JSON and streaming file source.

All readers emit the engine tick schema (schemas.TICK_SCHEMA) with an
explicit schema — never inference, which at 100 TB means a full
pre-scan and nondeterministic typing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_timeseries_java_spark.schemas import TICK_SCHEMA

# raw file columns: key, time (epoch millis), bid, ask[, is_live]
RAW_SCHEMA = ("key string, time long, bid double, ask double, "
              "is_live boolean")


def _to_ticks(df: DataFrame) -> DataFrame:
    cols = dict(df.dtypes)
    if "event_time" in cols:  # already engine-shaped (parquet tick store)
        return df.select("key", "event_time", "bid", "ask", "is_live")
    out = df.select(
        "key",
        (F.timestamp_millis(F.col("time")) if cols.get("time") == "bigint"
         else F.col("time").cast("timestamp")).alias("event_time"),
        F.col("bid").cast("double"),
        F.col("ask").cast("double"),
        (F.col("is_live") if "is_live" in cols else F.lit(True)).alias("is_live"),
    )
    return out


def read_ticks_parquet(spark: SparkSession, path: str) -> DataFrame:
    return _to_ticks(spark.read.parquet(path))


def read_ticks_csv(spark: SparkSession, path: str, header: bool = True) -> DataFrame:
    return _to_ticks(spark.read.schema(RAW_SCHEMA).option("header", header).csv(path))


def read_ticks_json(spark: SparkSession, path: str) -> DataFrame:
    return _to_ticks(spark.read.schema(RAW_SCHEMA).json(path))


def read_ticks_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC tick source — the other columnar format with embedded
    min/max statistics Spark ships a native vectorized reader for
    (predicate pushdown works the same as parquet; proven in
    tests/test_sources.py)."""
    return _to_ticks(spark.read.orc(path))


def stream_ticks_files(spark: SparkSession, path: str,
                       fmt: str = "parquet",
                       max_files_per_trigger: int | None = None) -> DataFrame:
    """Streaming file source for the candle pipeline. In production the
    same transformations run off Kafka (`spark.readStream.format("kafka")`)
    — the engine operators are source-agnostic DataFrame transforms."""
    reader = spark.readStream.schema(
        TICK_SCHEMA if fmt == "parquet" else RAW_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = getattr(reader, fmt)(path)
    return df if fmt == "parquet" else _to_ticks(df)
