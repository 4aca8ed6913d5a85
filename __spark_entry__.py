"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (sliding-window pairwise
correlation over the events tick stream) at sf0.001. ``queries()`` /
``oracle_sql()`` expose the full declared operator inventory
(SURVEY.md §2 + training-data extensions) for the sf0.01 DuckDB
correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: FX pipeline end-to-end on /root/testdata/sf0.001 —
    gap-filled OHLC candles → carry-forward → log returns → sliding
    window all-pairs Pearson correlation."""
    from data_timeseries_java_spark.queries.fx import q_fx_pair_correlation

    # Belt-and-suspenders since round 11, no longer load-bearing: every
    # operator is posture-independent (corr dispatches through
    # functions/stats.py::safe_corr; the test suite runs ANSI ON).
    # Classic semantics remain the engine default (session.py).
    spark.conf.set("spark.sql.ansi.enabled", "false")
    return q_fx_pair_correlation(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+M4/M6
    extensions). Each callable takes (spark, sf_dir) → DataFrame."""
    from data_timeseries_java_spark.queries import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents (same column names; computed
    float columns rounded identically on both sides). Queries without an
    entry here (Python-stub codecs) get the rows-only check."""
    from data_timeseries_java_spark.queries import all_oracles

    return all_oracles()
