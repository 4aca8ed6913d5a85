"""Prequential streaming anomalies: flags judged against prior-batch
stats only, reproduced exactly by a pandas replay."""

from __future__ import annotations

import glob
import math
import os
import time as _time
from datetime import datetime, timedelta, timezone

from data_timeseries_java_spark.streaming.anomaly_stream import (
    streaming_anomalies,
)

SCHEMA = "event_id long, ts timestamp, event_type string, value double"
T0 = datetime(2024, 5, 1, tzinfo=timezone.utc)


def _batches():
    t = lambda i: T0 + timedelta(seconds=i)
    # batch 0: 12 calm clicks (mean 30, modest spread) — builds history
    b0 = [(i, t(i), "click", 30.0 + (i % 5)) for i in range(12)]
    # batch 1: calm + one wild outlier; also first "view" rows (no
    # history yet → never flagged regardless of value)
    b1 = ([(100 + i, t(100 + i), "click", 31.0 + (i % 3)) for i in range(4)]
          + [(199, t(199), "click", 500.0)]
          + [(200, t(200), "view", 9999.0)])
    # batch 2: batch-1 rows (INCLUDING the 500 outlier) are history
    # now, so the inflated variance masks a medium 90.0 spike — the
    # known masking property of moment-based prequential scoring
    b2 = [(300, t(300), "click", 30.5), (301, t(301), "click", 90.0)]
    return [b0, b1, b2]


def _replay_expected(batches, z=3.0, min_n=10):
    hist: dict[str, list[float]] = {}
    expected = set()
    for rows in batches:
        for eid, _, k, v in rows:
            h = hist.get(k, [])
            if len(h) >= min_n:
                mean = sum(h) / len(h)
                var = sum(x * x for x in h) / len(h) - mean * mean
                std = math.sqrt(max(var, 0.0))
                if std > 0 and abs(v - mean) > z * std:
                    expected.add(eid)
        for eid, _, k, v in rows:  # train AFTER the whole batch scores
            hist.setdefault(k, []).append(v)
    return expected


def test_streaming_anomalies_prequential(spark, tmp_path):
    d = str(tmp_path)
    batches = _batches()
    base = _time.time() - 1000
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "overwrite").parquet(f"{d}/in/f{i}")
        for p in glob.glob(f"{d}/in/f{i}/*"):
            os.utime(p, (base + i * 10, base + i * 10))

    src = (spark.readStream.schema(SCHEMA)
           .option("maxFilesPerTrigger", 1).parquet(f"{d}/in/f*"))
    q = streaming_anomalies(spark, src, f"{d}/work")
    q.awaitTermination(120)

    got = spark.read.option("basePath", f"{d}/work/anomalies").parquet(
        f"{d}/work/anomalies")
    flagged = {r.event_id for r in got.collect()}
    assert flagged == _replay_expected(batches)
    assert 199 in flagged          # the wild outlier
    assert 200 not in flagged      # no history for its key
    assert 301 not in flagged      # masked by outlier-inflated variance
    # flags carry their evidence
    row = next(r for r in got.collect() if r.event_id == 199)
    assert row.prior_n >= 10 and row.prior_std > 0
