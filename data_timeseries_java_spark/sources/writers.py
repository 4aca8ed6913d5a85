"""Sinks: the storage layout that keeps 100 TB queryable.

Layout policy (SURVEY.md §7 M6):
- **Partition by event date** — every candle/correlation query carries a
  time range; date partitions turn it into partition PRUNING (the scan
  never opens irrelevant days).
- **Bucket by instrument key** — repeated per-key operations (candle
  agg, carry-forward, correlation re-runs) read co-located keys;
  bucketed tables let Spark skip the shuffle entirely for
  bucket-compatible joins/aggs.
- Target file sizes via `maxRecordsPerFile` so a 1000-executor scan
  gets well-sized splits (small-file storms are the #1 large-table
  operational failure).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_partitioned_ticks(ticks: DataFrame, path: str,
                            max_records_per_file: int = 5_000_000) -> None:
    """Date-partitioned parquet tick store."""
    (ticks
     .withColumn("event_date", F.to_date("event_time"))
     .write.mode("overwrite")
     .partitionBy("event_date")
     .option("maxRecordsPerFile", max_records_per_file)
     .parquet(path))


def write_bucketed_ticks(ticks: DataFrame, table: str, n_buckets: int = 64,
                         path: str | None = None) -> None:
    """Date-partitioned + key-bucketed managed table: co-locates each
    instrument's ticks so candle agg and correlation prep shuffle-free."""
    w = (ticks.withColumn("event_date", F.to_date("event_time"))
         .write.mode("overwrite")
         .partitionBy("event_date")
         .bucketBy(n_buckets, "key")
         .sortBy("key", "event_time"))
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def write_results(df: DataFrame, path: str, fmt: str = "parquet",
                  partition_cols: list[str] | None = None) -> None:
    """Result sink (the reference's logging sink S4, made durable)."""
    w = df.write.mode("overwrite").format(fmt)
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.save(path)
