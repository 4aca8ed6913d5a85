"""Stream-stream interval join: two watermarked tick streams joined
within an event-time bound (Spark buffers both sides in state and evicts
by watermark — the scalable form of the reference's side-input pairing)."""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import functions as F

from data_timeseries_java_spark.schemas import TICK_SCHEMA


def test_interval_join_two_tick_streams(spark, tmp_path):
    d = str(tmp_path)
    t = lambda m, s=0: datetime(2024, 7, 1, 0, m, s, tzinfo=timezone.utc)
    bids = [("K", t(0), 10.0, 10.0, True), ("K", t(2), 11.0, 11.0, True),
            ("K", t(10), 12.0, 12.0, True)]
    asks = [("K", t(0, 30), 10.5, 10.5, True), ("K", t(2, 20), 11.5, 11.5, True),
            ("K", t(30), 13.0, 13.0, True)]
    spark.createDataFrame(bids, TICK_SCHEMA).write.mode("overwrite").parquet(f"{d}/bids")
    spark.createDataFrame(asks, TICK_SCHEMA).write.mode("overwrite").parquet(f"{d}/asks")

    b = (spark.readStream.schema(TICK_SCHEMA).parquet(f"{d}/bids")
         .select("key", F.col("event_time").alias("bid_time"),
                 F.col("bid").alias("bid_px"))
         .withWatermark("bid_time", "0 seconds"))
    a = (spark.readStream.schema(TICK_SCHEMA).parquet(f"{d}/asks")
         .select(F.col("key").alias("akey"),
                 F.col("event_time").alias("ask_time"),
                 F.col("ask").alias("ask_px"))
         .withWatermark("ask_time", "0 seconds"))

    joined = b.join(
        a,
        (F.col("key") == F.col("akey"))
        & (F.col("ask_time") >= F.col("bid_time"))
        & (F.col("ask_time") <= F.col("bid_time") + F.expr("INTERVAL 1 MINUTE")),
    ).select("key", "bid_time", "bid_px", "ask_time", "ask_px")

    q = (joined.writeStream.format("memory").queryName("sj")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = {(r.bid_px, r.ask_px) for r in spark.table("sj").collect()}
    # bid@:00 pairs ask@:00:30; bid@:02 pairs ask@:02:20; the :10 bid and
    # :30 ask are outside every 1-minute bound
    assert rows == {(10.0, 10.5), (11.0, 11.5)}
