"""Full streaming pipeline vs batch pipeline on bounded input."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from data_timeseries_java_spark.operators import (
    CorrelationConfig,
    log_returns,
    pairwise_correlations,
)
from data_timeseries_java_spark.operators.candles import candles_pipeline
from data_timeseries_java_spark.schemas import TICK_SCHEMA
from data_timeseries_java_spark.streaming.pipeline import streaming_correlations

CFG = CorrelationConfig(window="600 seconds", slide="300 seconds",
                        min_corr=0.0, propagate_nan=True)


def test_streaming_correlations_match_batch(spark):
    import random
    from datetime import datetime, timezone

    from data_timeseries_java_spark.fixtures import demo_tick_rows

    d = tempfile.mkdtemp(prefix="spipe_")
    try:
        rng = random.Random(11)
        rows = demo_tick_rows()
        buckets = [[], [], []]
        for r in rows:
            buckets[min(r[1].minute // 4, 2)].append(r)
        for i, b in enumerate(buckets):
            rng.shuffle(b)
            spark.createDataFrame(b, TICK_SCHEMA).coalesce(1).write.mode(
                "overwrite").parquet(f"{d}/in/f{i}")
        sentinel = [("ZZ-SENTINEL", datetime(2016, 6, 1, tzinfo=timezone.utc),
                     1.0, 1.0, True)]
        spark.createDataFrame(sentinel, TICK_SCHEMA).coalesce(1).write.mode(
            "overwrite").parquet(f"{d}/in/f3")

        src = (spark.readStream.schema(TICK_SCHEMA)
               .option("maxFilesPerTrigger", 1).parquet(f"{d}/in/f*"))
        q = streaming_correlations(spark, src, f"{d}/out",
                                   resolution="120 seconds", config=CFG)
        q.awaitTermination(180)

        got = (spark.read.parquet(f"{d}/out/correlations")
               .where(~F.col("key1").startswith("ZZ-") & ~F.col("key2").startswith("ZZ-")))

        ticks = spark.createDataFrame(rows, TICK_SCHEMA)
        candles = candles_pipeline(ticks, ticks.select("key").distinct(), "120 seconds")
        want = pairwise_correlations(log_returns(candles), CFG)

        key = lambda r: (r.w_start_ms if hasattr(r, "w_start_ms")
                         else int(r.window_start.timestamp() * 1000),
                         r.key1, r.key2)
        got_map = {key(r): round(r.value, 9) for r in got.collect()}
        want_map = {key(r): round(r.value, 9) for r in want.collect()}
        assert set(got_map) == set(want_map)
        assert got_map == want_map
    finally:
        shutil.rmtree(d, ignore_errors=True)
