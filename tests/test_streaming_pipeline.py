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
from data_timeseries_java_spark.streaming.pipeline import (
    read_streaming_correlations,
    streaming_correlations,
)

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

        got = (read_streaming_correlations(spark, f"{d}/out")
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


def test_streaming_correlations_sparse_feed_matches_batch(spark):
    """Batch parity on a SPARSE feed (globally-dead windows between two
    active clusters): with the universe passed, the candle stage runs in
    global gap-fill mode and emits nothing for windows no instrument
    ticked in — the per-key mode would fabricate candles (and thus
    correlation windows) across the dead zone. Found by driving the
    pipeline over the (sparse) events table: per-key mode produced 49x
    the batch row count."""
    import random
    from datetime import datetime, timedelta, timezone

    d = tempfile.mkdtemp(prefix="spipe_sparse_")
    try:
        t0 = datetime(2016, 1, 4, 9, 0, tzinfo=timezone.utc)
        rows = []
        rng = random.Random(3)
        # two active clusters (minutes 0-5 and 40-45), dead in between
        for base_min in (0, 40):
            for m in range(6):
                for s in (5, 35):
                    for k in ("EUR/USD", "USD/JPY", "GBP/USD"):
                        t = t0 + timedelta(minutes=base_min + m, seconds=s)
                        px = 1.0 + rng.random() * 0.1
                        rows.append((k, t, px, px + 0.001, True))
        # one file per cluster → the dead zone spans a batch boundary
        half = len(rows) // 2
        for i, chunk in enumerate((rows[:half], rows[half:])):
            spark.createDataFrame(chunk, TICK_SCHEMA).coalesce(1).write.mode(
                "overwrite").parquet(f"{d}/in/f{i}")
        sentinel = [("ZZ-SENTINEL", datetime(2016, 6, 1, tzinfo=timezone.utc),
                     1.0, 1.0, True)]
        spark.createDataFrame(sentinel, TICK_SCHEMA).coalesce(1).write.mode(
            "overwrite").parquet(f"{d}/in/f2")

        universe = sorted({r[0] for r in rows}) + ["ZZ-SENTINEL"]
        src = (spark.readStream.schema(TICK_SCHEMA)
               .option("maxFilesPerTrigger", 1).parquet(f"{d}/in/f*"))
        q = streaming_correlations(spark, src, f"{d}/out",
                                   resolution="120 seconds", config=CFG,
                                   universe=universe)
        q.awaitTermination(180)

        got = (read_streaming_correlations(spark, f"{d}/out")
               .where(~F.col("key1").startswith("ZZ-")
                      & ~F.col("key2").startswith("ZZ-")))

        ticks = spark.createDataFrame(rows, TICK_SCHEMA)
        candles = candles_pipeline(ticks, ticks.select("key").distinct(),
                                   "120 seconds")
        want = pairwise_correlations(log_returns(candles), CFG)

        got_map = {(r.w_start_ms, r.key1, r.key2): round(r.value, 9)
                   for r in got.collect()}
        want_map = {(int(r.window_start.timestamp() * 1000), r.key1, r.key2):
                    round(r.value, 9) for r in want.collect()}
        assert set(got_map) == set(want_map)
        assert got_map == want_map
        assert len(got_map) > 0
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_compact_correlation_store(spark):
    """Folding the log store to one batch preserves the snapshot
    exactly and drops superseded directories."""
    import os
    import random
    from datetime import datetime, timezone

    from data_timeseries_java_spark.fixtures import demo_tick_rows
    from data_timeseries_java_spark.streaming.pipeline import (
        compact_correlation_store,
    )

    d = tempfile.mkdtemp(prefix="spipe_compact_")
    try:
        rng = random.Random(23)
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

        before = {tuple(r) for r in
                  read_streaming_correlations(spark, f"{d}/out").collect()}
        stats = compact_correlation_store(spark, f"{d}/out")
        assert stats["batches_before"] > 1 and stats["batches_after"] == 1
        dirs = [x for x in os.listdir(f"{d}/out/correlations")
                if x.startswith("batch_id=")]
        assert len(dirs) == 1
        after = {tuple(r) for r in
                 read_streaming_correlations(spark, f"{d}/out").collect()}
        assert after == before and len(after) == stats["rows"]
        # idempotent: a second compaction is a no-op
        assert compact_correlation_store(spark, f"{d}/out")[
            "batches_after"] == 1
    finally:
        shutil.rmtree(d, ignore_errors=True)
