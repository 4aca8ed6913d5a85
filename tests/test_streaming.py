"""Streaming tier (SURVEY.md §5): batch/stream equivalence on bounded
input, with out-of-order delivery across micro-batches."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from data_timeseries_java_spark.fixtures import demo_tick_rows
from data_timeseries_java_spark.operators import complete_candles, ohlc_candles
from data_timeseries_java_spark.schemas import TICK_SCHEMA
from data_timeseries_java_spark.streaming import (
    streaming_complete_candles,
    streaming_ohlc_candles,
)


@pytest.fixture(scope="module")
def tick_dir(spark):
    """Demo ticks as a file-stream source: 3 files, rows shuffled within
    files so arrival order != event order inside a micro-batch."""
    d = tempfile.mkdtemp(prefix="ticks_stream_")
    rows = demo_tick_rows()
    # split by minute ranges so later files hold later windows (watermark
    # order across batches), but shuffle within each file
    import random
    rng = random.Random(7)
    buckets = [[], [], []]
    for r in rows:
        m = (r[1].minute) // 4  # minutes 0-3, 4-7, 8-9
        buckets[min(m, 2)].append(r)
    for i, b in enumerate(buckets):
        rng.shuffle(b)
        spark.createDataFrame(b, TICK_SCHEMA).coalesce(1).write.mode(
            "overwrite").parquet(f"{d}/f{i}")
    # sentinel far-future tick: pushes the watermark past the last real
    # window so append mode flushes it (otherwise the final candle stays
    # in state forever — there is no later trigger to close it)
    from datetime import datetime, timezone
    sentinel = [("ZZ-SENTINEL",
                 datetime(2016, 6, 1, tzinfo=timezone.utc), 1.0, 1.0, True)]
    spark.createDataFrame(sentinel, TICK_SCHEMA).coalesce(1).write.mode(
        "overwrite").parquet(f"{d}/f3")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _run_stream(spark, tick_dir, transform, name):
    src = (spark.readStream.schema(TICK_SCHEMA)
           .option("maxFilesPerTrigger", 1)
           .parquet(f"{tick_dir}/f*"))
    out = transform(src)
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    return spark.table(name).where(~F.col("key").startswith("ZZ-"))


def test_streaming_candles_match_batch(spark, tick_dir):
    src_batch = (spark.read.schema(TICK_SCHEMA).parquet(f"{tick_dir}/f*")
                 .where(~F.col("key").startswith("ZZ-")))
    batch = ohlc_candles(src_batch, "120 seconds").select(
        "key", "window_start",
        F.col("close.ask").alias("close_ask"),
        F.col("min_ask.ask").alias("mn"),
        F.col("max_ask.ask").alias("mx"),
    )
    stream = _run_stream(
        spark, tick_dir,
        lambda s: streaming_ohlc_candles(s, "120 seconds").select(
            "key", "window_start",
            F.col("close.ask").alias("close_ask"),
            F.col("min_ask.ask").alias("mn"),
            F.col("max_ask.ask").alias("mx"),
        ),
        "stream_candles")
    b = {tuple(r) for r in batch.collect()}
    s = {tuple(r) for r in stream.collect()}
    assert s == b
    assert len(s) == 23  # 5 keys x 5 windows minus TS-3/TS-4 gap window


def test_streaming_carry_forward_matches_batch(spark, tick_dir):
    from data_timeseries_java_spark.operators import gap_fill

    src_batch = (spark.read.schema(TICK_SCHEMA).parquet(f"{tick_dir}/f*")
                 .where(~F.col("key").startswith("ZZ-")))
    filled = gap_fill(src_batch, src_batch.select("key").distinct(),
                      "120 seconds")
    batch = complete_candles(ohlc_candles(filled, "120 seconds")).select(
        "key", "window_start",
        F.col("open.ask").alias("open_ask"),
        F.col("close.ask").alias("close_ask"),
    )
    stream = _run_stream(
        spark, tick_dir,
        lambda s: streaming_complete_candles(s, "120 seconds").select(
            "key", "window_start", "open_ask", "close_ask"),
        "stream_complete")
    b = {tuple(r) for r in batch.collect()}
    s = {tuple(r) for r in stream.collect()}
    assert s == b
    # gap-filled: all 5 keys x 5 windows present, including TS-3/TS-4's
    # interior gap window
    assert len(s) == 25
