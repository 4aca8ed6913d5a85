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


def test_compact_parquet_reduces_files_preserves_rows(spark, tmpd):
    from data_timeseries_java_spark.sources.writers import compact_parquet

    path = f"{tmpd}/fragmented"
    events = (spark.range(0, 2000)
              .select(F.col("id"),
                      (F.col("id") % 7).alias("grp"),
                      F.md5(F.col("id").cast("string")).alias("payload")))
    # simulate a micro-batch sink: many tiny files
    events.repartition(40).write.mode("overwrite").parquet(path)
    before = spark.read.parquet(path)
    before_sum = before.agg(F.sum("id")).collect()[0][0]

    stats = compact_parquet(spark, path, target_file_bytes=64 * 1024 * 1024)
    assert stats["files_before"] >= 40
    assert stats["files_after"] < stats["files_before"]

    after = spark.read.parquet(path)
    assert after.count() == 2000
    assert after.agg(F.sum("id")).collect()[0][0] == before_sum


def test_compact_parquet_keeps_partition_layout(spark, tmpd):
    from data_timeseries_java_spark.sources.writers import compact_parquet

    path = f"{tmpd}/frag_part"
    events = (spark.range(0, 1000)
              .select(F.col("id"), (F.col("id") % 4).alias("day")))
    events.repartition(25).write.mode("overwrite").partitionBy("day").parquet(path)

    compact_parquet(spark, path, partition_col="day")
    after = spark.read.parquet(path)
    assert after.count() == 1000
    # partition directories survive → pruning still works
    assert "PartitionFilters: [isnotnull(day" in formatted_plan(
        after.where(F.col("day") == 2))
    assert after.where(F.col("day") == 2).count() == 250
    import pathlib
    assert (pathlib.Path(path) / "day=2").is_dir()


def test_read_ticks_orc_roundtrip(spark, tmp_path):
    """ORC sink/source parity with the parquet tick path."""
    from data_timeseries_java_spark.fixtures import demo_ticks
    from data_timeseries_java_spark.sources.readers import read_ticks_orc

    ticks = demo_ticks(spark)
    ticks.write.mode("overwrite").orc(str(tmp_path / "orc"))
    back = read_ticks_orc(spark, str(tmp_path / "orc"))
    assert {tuple(r) for r in back.collect()} == \
        {tuple(r) for r in ticks.collect()}


def test_range_clustered_files_are_disjoint(spark, tmp_path):
    """write_range_clustered: every parquet file covers a disjoint
    value range of the clustering column (checked from the REAL footer
    statistics via pyarrow), so range predicates skip whole files."""
    import pyarrow.parquet as pq

    from data_timeseries_java_spark.sources.writers import (
        write_range_clustered,
    )

    df = spark.range(10_000).select(
        (F.col("id") * 7919 % 10_000).alias("v"),  # shuffled values
        F.col("id").alias("payload"))
    out = str(tmp_path / "clustered")
    write_range_clustered(df, out, ["v"], n_files=4)

    import glob
    ranges = []
    for f in glob.glob(f"{out}/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)
            assert col.path_in_schema == "v"
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        ranges.append((min(mins), max(maxs)))
    assert len(ranges) == 4
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2, f"file ranges overlap: {ranges}"
    # and a range filter prunes to ~1 file's worth of splits
    got = spark.read.parquet(out).where(F.col("v") < 100).count()
    assert got == 100


def test_dynamic_partition_pruning_fires(spark, tmpd):
    """The 100 TB star-join layout contract: when the fact table is
    directory-partitioned on the join key and the dim side carries a
    selective filter, Catalyst must inject a dynamic-partition-pruning
    subquery (the dim's surviving keys prune fact PARTITIONS at
    runtime) — without DPP the fact side reads every partition and
    filters after the scan, which is exactly the full-scan a
    partitioned warehouse layout exists to avoid."""
    fact = spark.range(0, 10_000).select(
        F.col("id"), (F.col("id") % 30).alias("day"),
        (F.col("id") % 7).alias("k"))
    fact.write.partitionBy("day").mode("overwrite").parquet(f"{tmpd}/fact")
    dim = spark.range(0, 30).select(
        F.col("id").alias("day"), (F.col("id") % 3).alias("grp"))
    dim.write.mode("overwrite").parquet(f"{tmpd}/dim")

    f = spark.read.parquet(f"{tmpd}/fact")
    d = spark.read.parquet(f"{tmpd}/dim").where(F.col("grp") == 1)
    j = f.join(d, "day").groupBy("k").count()
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), (
        "no dynamic-partition-pruning subquery in the star-join plan")
    # and the pruning is correct: only grp==1 days' rows aggregate
    want = (f.join(F.broadcast(d.select("day")), "day")
            .count())
    assert j.agg(F.sum("count")).first()[0] == want
