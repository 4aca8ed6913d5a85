"""Streaming as-of join: stream==batch equivalence under out-of-order
micro-batch delivery, plus state-retention semantics."""

from __future__ import annotations

import random
import shutil
import tempfile
from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from data_timeseries_java_spark.operators.temporal import asof_join
from data_timeseries_java_spark.streaming.asof_stream import (
    streaming_asof_join,
    streaming_asof_join_bucketed,
)

TRADE_SCHEMA = "key string, event_time timestamp, qty double"
QUOTE_SCHEMA = "key string, event_time timestamp, px double"


def _t(m, s=0):
    return datetime(2024, 7, 1, 0, m, s, tzinfo=timezone.utc)


@pytest.fixture(scope="module")
def asof_dirs(spark):
    """Trades and quotes for two keys, split into 3 micro-batch files
    each, shuffled within files — arrival order != event order. Batch f2
    carries a late quote (minute 5) AFTER trades past it have been seen,
    still inside the watermark horizon of its batch."""
    rng = random.Random(13)
    trades, quotes = [], []
    for k, off in (("EUR", 0), ("JPY", 30)):
        for m in range(0, 12, 2):
            trades.append((k, _t(m, off + 10), float(10 + m)))
        for m in range(0, 12, 3):
            quotes.append((k, _t(m, off), float(100 + m)))
    d = tempfile.mkdtemp(prefix="asof_stream_")
    # bucket by minute so later files hold later event times (the
    # watermark advances across batches), shuffle within each file
    for name, rows, schema in (("trades", trades, TRADE_SCHEMA),
                               ("quotes", quotes, QUOTE_SCHEMA)):
        buckets = [[], [], []]
        for r in rows:
            buckets[min(r[1].minute // 4, 2)].append(r)
        for i, b in enumerate(buckets):
            rng.shuffle(b)
            spark.createDataFrame(b, schema).coalesce(1).write.mode(
                "overwrite").parquet(f"{d}/{name}/f{i}")
    # sentinel rows push the watermark past every real event so append
    # mode flushes the tail
    spark.createDataFrame(
        [("ZZ", datetime(2024, 7, 2, tzinfo=timezone.utc), 0.0)],
        TRADE_SCHEMA).coalesce(1).write.mode("overwrite").parquet(
        f"{d}/trades/f3")
    spark.createDataFrame(
        [("ZZ", datetime(2024, 7, 2, tzinfo=timezone.utc), 0.0)],
        QUOTE_SCHEMA).coalesce(1).write.mode("overwrite").parquet(
        f"{d}/quotes/f3")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _run(spark, d, name, watermark="4 minutes"):
    trades = (spark.readStream.schema(TRADE_SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(f"{d}/trades/f*"))
    quotes = (spark.readStream.schema(QUOTE_SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(f"{d}/quotes/f*"))
    out = streaming_asof_join(trades, quotes, on="key",
                              watermark=watermark)
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    return spark.table(name).where(F.col("key") != "ZZ")


def test_streaming_asof_matches_batch(spark, asof_dirs):
    batch_trades = (spark.read.schema(TRADE_SCHEMA)
                    .parquet(f"{asof_dirs}/trades/f*")
                    .where(F.col("key") != "ZZ"))
    batch_quotes = (spark.read.schema(QUOTE_SCHEMA)
                    .parquet(f"{asof_dirs}/quotes/f*")
                    .where(F.col("key") != "ZZ"))
    batch = asof_join(batch_trades, batch_quotes, on="key",
                      left_time="event_time", right_time="event_time")
    b = {tuple(r) for r in batch.select(
        "key", "event_time", "qty", "px_asof", "event_time_asof").collect()}
    s = {tuple(r) for r in _run(spark, asof_dirs, "asof_s1").select(
        "key", "event_time", "qty", "px_asof", "event_time_asof").collect()}
    assert b == s
    assert len(s) == 12  # every trade has a prior quote (quote at m=0)


def test_streaming_asof_inner_semantics(spark, tmp_path):
    """A left row earlier than every right row is dropped (inner), and a
    right row at the exact left timestamp matches (<=)."""
    d = str(tmp_path)
    spark.createDataFrame(
        [("K", _t(0), 1.0), ("K", _t(2), 2.0)],
        TRADE_SCHEMA).coalesce(1).write.parquet(f"{d}/trades/f0")
    spark.createDataFrame(
        [("K", _t(2), 200.0), ("K", _t(3), 300.0)],
        QUOTE_SCHEMA).coalesce(1).write.parquet(f"{d}/quotes/f0")
    spark.createDataFrame(
        [("ZZ", _t(59), 0.0)], TRADE_SCHEMA).coalesce(1).write.parquet(
        f"{d}/trades/f1")
    spark.createDataFrame(
        [("ZZ", _t(59), 0.0)], QUOTE_SCHEMA).coalesce(1).write.parquet(
        f"{d}/quotes/f1")
    rows = {(r.key, r.event_time.minute, r.qty, r.px_asof)
            for r in _run(spark, d, "asof_s2", watermark="0 seconds")
            .where(F.col("key") != "ZZ").collect()}
    assert rows == {("K", 2, 2.0, 200.0)}


def test_streaming_asof_tolerance(spark, tmp_path):
    """tolerance= drops stale matches, mirroring the batch operator."""
    d = str(tmp_path)
    spark.createDataFrame(
        [("K", _t(5), 1.0), ("K", _t(30), 2.0)],
        TRADE_SCHEMA).coalesce(1).write.parquet(f"{d}/trades/f0")
    spark.createDataFrame(
        [("K", _t(4), 40.0)],
        QUOTE_SCHEMA).coalesce(1).write.parquet(f"{d}/quotes/f0")
    spark.createDataFrame(
        [("ZZ", _t(59), 0.0)], TRADE_SCHEMA).coalesce(1).write.parquet(
        f"{d}/trades/f1")
    spark.createDataFrame(
        [("ZZ", _t(59), 0.0)], QUOTE_SCHEMA).coalesce(1).write.parquet(
        f"{d}/quotes/f1")
    trades = (spark.readStream.schema(TRADE_SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(f"{d}/trades/f*"))
    quotes = (spark.readStream.schema(QUOTE_SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(f"{d}/quotes/f*"))
    out = streaming_asof_join(trades, quotes, on="key",
                              watermark="0 seconds",
                              tolerance="10 minutes")
    q = (out.writeStream.format("memory").queryName("asof_tol")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = {(r.event_time.minute, r.px_asof)
            for r in spark.table("asof_tol")
            .where(F.col("key") != "ZZ").collect()}
    assert rows == {(5, 40.0)}   # minute-30 trade's only match is stale


def _run_bucketed(spark, d, name, watermark="4 minutes", n_buckets=2,
                  tolerance=None):
    trades = (spark.readStream.schema(TRADE_SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(f"{d}/trades/f*"))
    quotes = (spark.readStream.schema(QUOTE_SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(f"{d}/quotes/f*"))
    out = streaming_asof_join_bucketed(trades, quotes, on="key",
                                       watermark=watermark,
                                       tolerance=tolerance,
                                       n_buckets=n_buckets)
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    return spark.table(name).where(F.col("key") != "ZZ")


def test_bucketed_asof_matches_batch_and_perkey(spark, asof_dirs):
    """The bucketed wide-state variant must produce EXACTLY the batch
    operator's rows — with n_buckets=1 so every key shares one state
    bucket (the hardest collision case: the per-bucket merge_asof must
    keep the keys apart by itself)."""
    batch_trades = (spark.read.schema(TRADE_SCHEMA)
                    .parquet(f"{asof_dirs}/trades/f*")
                    .where(F.col("key") != "ZZ"))
    batch_quotes = (spark.read.schema(QUOTE_SCHEMA)
                    .parquet(f"{asof_dirs}/quotes/f*")
                    .where(F.col("key") != "ZZ"))
    batch = asof_join(batch_trades, batch_quotes, on="key",
                      left_time="event_time", right_time="event_time")
    b = {tuple(r) for r in batch.select(
        "key", "event_time", "qty", "px_asof", "event_time_asof").collect()}
    s = {tuple(r) for r in
         _run_bucketed(spark, asof_dirs, "asof_bk1", n_buckets=1).select(
             "key", "event_time", "qty", "px_asof",
             "event_time_asof").collect()}
    assert b == s and len(s) == 12
    s64 = {tuple(r) for r in
           _run_bucketed(spark, asof_dirs, "asof_bk64",
                         n_buckets=64).select(
               "key", "event_time", "qty", "px_asof",
               "event_time_asof").collect()}
    assert b == s64


def test_bucketed_asof_inner_and_tolerance(spark, tmp_path):
    """Inner semantics (no prior right row -> dropped; exact-timestamp
    right matches) and the staleness tolerance, through the bucketed
    path."""
    d = str(tmp_path)
    spark.createDataFrame(
        [("K", _t(0), 1.0), ("K", _t(2), 2.0), ("K", _t(30), 3.0)],
        TRADE_SCHEMA).coalesce(1).write.parquet(f"{d}/trades/f0")
    spark.createDataFrame(
        [("K", _t(2), 200.0), ("K", _t(3), 300.0)],
        QUOTE_SCHEMA).coalesce(1).write.parquet(f"{d}/quotes/f0")
    spark.createDataFrame(
        [("ZZ", _t(59), 0.0)], TRADE_SCHEMA).coalesce(1).write.parquet(
        f"{d}/trades/f1")
    spark.createDataFrame(
        [("ZZ", _t(59), 0.0)], QUOTE_SCHEMA).coalesce(1).write.parquet(
        f"{d}/quotes/f1")
    rows = {(r.key, r.event_time.minute, r.qty, r.px_asof)
            for r in _run_bucketed(spark, d, "asof_bk_tol",
                                   watermark="0 seconds",
                                   tolerance="10 minutes").collect()}
    # t(0) trade: no prior quote -> dropped (inner); t(2) matches the
    # exact-timestamp quote; t(30)'s only match (t=3) is stale
    assert rows == {("K", 2, 2.0, 200.0)}


def test_bucketed_asof_ties_and_rightless_keys(spark, tmp_path):
    """Edge cases through the bucketed path: two right rows at the SAME
    timestamp (the later ARRIVAL wins, matching the per-key operator's
    stable-sort contract), a key with no right rows at all (all its
    lefts drop, inner), and a right-only key (emits nothing)."""
    d = str(tmp_path)
    # f0: quotes only — two quotes for K at the same minute (100 then
    # 111 in arrival order), nothing for L, one for M
    spark.createDataFrame(
        [("K", _t(1), 100.0), ("K", _t(1), 111.0), ("M", _t(1), 500.0)],
        QUOTE_SCHEMA).coalesce(1).write.parquet(f"{d}/quotes/f0")
    # f1: trades for K (matches the tie), L (no quotes -> dropped)
    spark.createDataFrame(
        [("K", _t(2), 1.0), ("L", _t(2), 2.0)],
        TRADE_SCHEMA).coalesce(1).write.parquet(f"{d}/trades/f0")
    spark.createDataFrame(
        [("ZZ", _t(59), 0.0)], TRADE_SCHEMA).coalesce(1).write.parquet(
        f"{d}/trades/f1")
    spark.createDataFrame(
        [("ZZ", _t(59), 0.0)], QUOTE_SCHEMA).coalesce(1).write.parquet(
        f"{d}/quotes/f1")
    rows = {(r.key, r.qty, r.px_asof)
            for r in _run_bucketed(spark, d, "asof_bk_edge",
                                   watermark="0 seconds",
                                   n_buckets=1).collect()}
    # K matched to the LATER-ARRIVING equal-time quote; L dropped;
    # M (right-only) emits nothing
    assert rows == {("K", 1.0, 111.0)}
