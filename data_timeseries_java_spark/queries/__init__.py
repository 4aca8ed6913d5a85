"""Declared query surface: the driver-checkable operator inventory.

Each submodule exposes ``QUERIES: dict[str, callable(spark, sf_dir) ->
DataFrame]`` and ``ORACLE: dict[str, str]`` (DuckDB ANSI SQL over the same
parquet tables). The driver — and ``tests/test_oracle.py`` — runs both
sides and compares row counts, schemas, and order-insensitive value
hashes.

Output conventions for stable cross-engine hashing:
- time columns as epoch-millis BIGINT (no timezone/precision ambiguity)
- floating-point results of arithmetic rounded via ``round(x, 6)`` on
  both sides (raw column values pass through unrounded — they're exact)
- aggregates aliased identically in Spark and SQL
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_timeseries_java_spark.queries import (
    corpus,
    dedup,
    fx,
    multimodal,
    relational,
    relational_ext,
    scale,
    similarity,
    text,
    tpch_hard,
)

_MODULES = [fx, relational, relational_ext, tpch_hard, dedup, text,
            similarity, multimodal, corpus, scale]


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable] = {}
    for m in _MODULES:
        overlap = set(out) & set(m.QUERIES)
        assert not overlap, f"duplicate query names: {overlap}"
        out.update(m.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLE)
    return out
