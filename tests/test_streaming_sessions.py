"""Streaming sessionization: session_window across micro-batches must
equal the batch run of the same expression, and (on a boundary-free
fixture) the batch lag/cumsum idiom."""

from __future__ import annotations

import glob
import os
import time as _time
from datetime import datetime, timedelta, timezone

from pyspark.sql import Window
from pyspark.sql import functions as F

from data_timeseries_java_spark.streaming import sessionize, streaming_sessions

SCHEMA = "user_id long, ts timestamp, value double"
T0 = datetime(2024, 5, 1, 0, 0, tzinfo=timezone.utc)


def _rows():
    """Two users, sessions split by >30min gaps; no inter-event gap is
    exactly 30min (the documented session_window/lag-cumsum boundary)."""
    t = lambda m: T0 + timedelta(minutes=m)
    return [
        # user 1: session A (0, 10, 25), session B (70, 75)
        (1, t(0), 1.0), (1, t(10), 2.0), (1, t(25), 3.0),
        (1, t(70), 4.0), (1, t(75), 5.0),
        # user 2: session A (5), session B (95, 100, 101)
        (2, t(5), 10.0), (2, t(95), 20.0), (2, t(100), 30.0),
        (2, t(101), 40.0),
    ]


def test_streaming_sessions_match_batch(spark, tmp_path):
    d = str(tmp_path)
    rows = _rows()
    # three files split by time, shuffled within each so arrival order
    # != event order inside a micro-batch
    import random
    rng = random.Random(11)
    buckets = [[r for r in rows if r[1].minute < 30],
               [r for r in rows if 30 <= r[1].minute < 90],
               [r for r in rows if r[1].minute >= 90]]
    base = _time.time() - 1000
    for i, b in enumerate(buckets):
        rng.shuffle(b)
        spark.createDataFrame(b, SCHEMA).coalesce(1).write.mode(
            "overwrite").parquet(f"{d}/f{i}")
        for p in glob.glob(f"{d}/f{i}/*"):
            os.utime(p, (base + i * 10, base + i * 10))
    # sentinel: pushes the watermark past the last real session close so
    # append mode flushes it
    sentinel = [(999, T0 + timedelta(days=1), 0.0)]
    spark.createDataFrame(sentinel, SCHEMA).coalesce(1).write.mode(
        "overwrite").parquet(f"{d}/f3")
    for p in glob.glob(f"{d}/f3/*"):
        os.utime(p, (base + 30, base + 30))

    src = (spark.readStream.schema(SCHEMA)
           .option("maxFilesPerTrigger", 1).parquet(f"{d}/f*"))
    out = streaming_sessions(src, gap="30 minutes", watermark="10 minutes")
    q = (out.writeStream.format("memory").queryName("sessions_stream")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.table("sessions_stream")
                 .where(F.col("user_id") != 999).collect()))

    batch = sorted(map(tuple, sessionize(
        spark.createDataFrame(rows, SCHEMA), gap="30 minutes").collect()))
    assert got == batch
    assert len(got) == 4  # 2 sessions per user


def test_session_window_matches_lag_cumsum_idiom(spark):
    """On boundary-free data the native session_window aggregation and
    the batch lag/cumsum idiom (q_user_sessions) produce identical
    session boundaries and aggregates."""
    df = spark.createDataFrame(_rows(), SCHEMA)
    native = sorted(map(tuple, sessionize(df, gap="30 minutes").collect()))

    w = Window.partitionBy("user_id").orderBy("ts")
    flagged = df.select(
        "user_id", "ts", "value",
        F.when(F.unix_millis("ts") - F.unix_millis(F.lag("ts").over(w))
               > 30 * 60 * 1000, 1).otherwise(0).alias("new_session"))
    sess = flagged.withColumn(
        "seq", F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    idiom = sorted(map(tuple, sess.groupBy("user_id", "seq").agg(
        F.unix_millis(F.min("ts")).alias("session_start_ms"),
        F.unix_millis(F.max("ts")).alias("session_last_ms"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 6).alias("session_value"))
        .select("user_id", "session_start_ms", "session_last_ms",
                "n_events", "session_value").collect()))
    assert native == idiom
