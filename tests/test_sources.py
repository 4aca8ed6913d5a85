"""Source/sink round-trips: every reader yields the tick schema; the
partitioned writer produces a prunable layout."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from data_timeseries_java_spark.fixtures import demo_ticks
from data_timeseries_java_spark.plans import formatted_plan
from data_timeseries_java_spark.schemas import TICK_SCHEMA
from data_timeseries_java_spark.sources import (
    read_ticks_csv,
    read_ticks_json,
    read_ticks_parquet,
    write_partitioned_ticks,
)


@pytest.fixture(scope="module")
def tmpd():
    d = tempfile.mkdtemp(prefix="sources_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_csv_json_parquet_round_trip(spark, tmpd):
    ticks = demo_ticks(spark)
    raw = ticks.select("key", F.unix_millis("event_time").alias("time"),
                       "bid", "ask", "is_live")
    raw.write.mode("overwrite").option("header", True).csv(f"{tmpd}/csv")
    raw.write.mode("overwrite").json(f"{tmpd}/json")
    ticks.write.mode("overwrite").parquet(f"{tmpd}/parquet")

    expected = {tuple(r) for r in ticks.collect()}
    want = [(f.name, f.dataType) for f in TICK_SCHEMA.fields]
    for df in (read_ticks_csv(spark, f"{tmpd}/csv"),
               read_ticks_json(spark, f"{tmpd}/json"),
               read_ticks_parquet(spark, f"{tmpd}/parquet")):
        # file sources report nullable columns; names/types must match
        assert [(f.name, f.dataType) for f in df.schema.fields] == want
        assert {tuple(r) for r in df.collect()} == expected


def test_partitioned_write_prunes(spark, tmpd):
    ticks = demo_ticks(spark)
    write_partitioned_ticks(ticks, f"{tmpd}/part")
    back = spark.read.parquet(f"{tmpd}/part")
    q = back.where(F.col("event_date") == "2015-12-31")
    plan = formatted_plan(q)
    # partition filter must prune at planning, not post-scan filter
    assert "PartitionFilters" in plan
    assert q.count() == ticks.count()  # demo data is one UTC date
