"""Contract tests for the stream-replay scaffolding
(streaming/replay.py) shared by the driver-gated replay queries."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from data_timeseries_java_spark.streaming.replay import (
    read_replay_sink,
    write_replay_buckets,
    write_sentinel_file,
)


def test_sink_batch_overwrite_is_idempotent(spark, tmp_path):
    """A foreachBatch retry re-writes its own batch_id directory with
    overwrite — the sink must read back WITHOUT duplicates."""
    out = str(tmp_path / "out")
    spark.range(5).write.mode("overwrite").parquet(f"{out}/batch_id=0")
    spark.range(5).write.mode("overwrite").parquet(f"{out}/batch_id=0")
    spark.range(5, 8).write.mode("overwrite").parquet(f"{out}/batch_id=1")
    got = sorted(r.id for r in read_replay_sink(spark, out).collect())
    assert got == list(range(8))
    assert "batch_id" not in read_replay_sink(spark, out).columns


def test_replay_buckets_partition_time_and_order_mtimes(spark, tmp_path):
    """Buckets partition the time range completely (no row lost), file
    mtimes ascend with bucket index, and the sentinel file is newest."""
    d = str(tmp_path / "in")
    df = spark.range(100).select(
        F.col("id"),
        F.timestamp_millis(1_460_000_000_000 + F.col("id") * 1000)
        .alias("ts"))
    write_replay_buckets(df, "ts", d, 4, 1_460_000_000_000,
                         100_000, 1_000_000.0, ["id", "ts"])
    sent = spark.range(1).select(
        F.col("id"),
        F.timestamp_millis(F.lit(1_470_000_000_000)).alias("ts"))
    write_sentinel_file(sent, d, 4, 1_000_000.0)

    back = spark.read.parquet(f"{d}/f*")
    assert back.count() == 101
    mtimes = [max(os.path.getmtime(p) for p in glob.glob(f"{d}/f{i}/*"))
              for i in range(5)]
    assert mtimes == sorted(mtimes)
    # each real bucket holds a contiguous quarter of the time range
    for i in range(4):
        ids = sorted(r.id for r in
                     spark.read.parquet(f"{d}/f{i}").collect())
        assert ids == list(range(i * 25, (i + 1) * 25))


def test_topk_store_geometry_guard(spark, tmp_path):
    """Resolving a top-k store with a mismatched sketch geometry must
    raise, not silently return garbage estimates."""
    import pytest

    from data_timeseries_java_spark.streaming import (
        read_streaming_topk,
        streaming_cms_topk,
    )

    src_dir = str(tmp_path / "in")
    spark.range(100).select(
        (F.col("id") % 7).alias("user_id"),
        F.timestamp_millis(1_460_000_000_000 + F.col("id")).alias("ts"),
    ).write.mode("overwrite").parquet(f"{src_dir}/f0")
    src = (spark.readStream
           .schema("user_id bigint, ts timestamp")
           .option("maxFilesPerTrigger", 1).parquet(f"{src_dir}/f*"))
    q = streaming_cms_topk(spark, src, str(tmp_path / "out"),
                           key_col="user_id", depth=4, width=128)
    assert q.awaitTermination(120)
    # geometry read from the store's own meta rows
    top = read_streaming_topk(spark, str(tmp_path / "out"), k=5).collect()
    assert len(top) == 5
    with pytest.raises(ValueError, match="width=128"):
        read_streaming_topk(spark, str(tmp_path / "out"), width=256)
