"""Deterministic FX demo fixtures (reference parity).

Rebuilds the reference's in-memory generator dataset
(``GenerateSampleData.getTestData()``,
``application/pipelines/fx/GenerateSampleData.java:81-159``): 5 instrument
streams x 10 minutes of 1-minute ticks; TS-3/TS-4 miss minutes 2,3,7,8 →
42 rows total. Epochs are pinned absolute (FIXTURES.md): the reference's
goldens imply t0 = 1451577600000 (2015-12-31T16:00:00Z) because its
generator parsed "01/01/2016 00:00:00" in a UTC+8 default zone
(SURVEY.md §2.9.6) — we never re-derive from local-time parsing.

TS-5 uses Math.random() in the reference; here a fixed seed so goldens are
reproducible.
"""

from __future__ import annotations

import random
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession

from data_timeseries_java_spark.schemas import INSTRUMENT_SCHEMA, TICK_SCHEMA

T0_MS = 1451577600000  # 2015-12-31T16:00:00Z
MINUTE_MS = 60_000

# value per minute index 0..9 (GenerateSampleData.java:89-134)
_TRIANGLE = [1.0, 2.0, 3.0, 4.0, 5.0, 5.0, 4.0, 3.0, 2.0, 1.0]
_INVERTED = {0: 10.0, 1: 9.0, 4: 6.0, 5: 6.0, 6: 7.0, 9: 10.0}  # gaps 2,3,7,8

DEMO_KEYS = ["TS-1", "TS-2", "TS-3", "TS-4", "TS-5"]


def _ts(ms: int) -> datetime:
    return datetime.fromtimestamp(ms / 1000.0, tz=timezone.utc)


def demo_tick_rows() -> list[tuple]:
    """The 42-row demo dataset as python tuples (key, time, bid, ask, live)."""
    rows: list[tuple] = []
    for key in ("TS-1", "TS-2"):
        for m, v in enumerate(_TRIANGLE):
            rows.append((key, _ts(T0_MS + m * MINUTE_MS), v, v, True))
    for key in ("TS-3", "TS-4"):
        for m, v in sorted(_INVERTED.items()):
            rows.append((key, _ts(T0_MS + m * MINUTE_MS), v, v, True))
    rng = random.Random(42)
    for m in range(10):
        bid = rng.random()
        ask = rng.random()
        rows.append(("TS-5", _ts(T0_MS + m * MINUTE_MS), bid, ask, True))
    return rows


def demo_ticks(spark: SparkSession) -> DataFrame:
    """Reference source S1+S2: bounded in-memory generator with event
    timestamps embedded in the rows (no side-channel timestamp in Spark)."""
    return spark.createDataFrame(demo_tick_rows(), TICK_SCHEMA)


def demo_instruments(spark: SparkSession) -> DataFrame:
    """Reference S3 (WorkPacketConfig keys): the static instrument universe
    as a small dimension DataFrame (broadcast at join time)."""
    return spark.createDataFrame([(k,) for k in DEMO_KEYS], INSTRUMENT_SCHEMA)
