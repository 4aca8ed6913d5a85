"""Oracle-tier regression: every declared query hash-matches its DuckDB
oracle at sf0.001 (the driver repeats this at sf0.01)."""

from __future__ import annotations

import duckdb
import pytest

from data_timeseries_java_spark.queries import all_oracles, all_queries
from data_timeseries_java_spark.tables import TABLE_NAMES

from scripts.oracle_check import compare  # repo-root scripts on sys.path via conftest


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", sorted(all_queries()))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    queries = all_queries()
    oracles = all_oracles()
    # every declared query MUST ship a DuckDB oracle — a silent
    # rows-only fallback here would mask a new query added unverified
    assert name in oracles, f"{name} declared without an oracle"
    sdf = queries[name](spark, sf_dir).toPandas()
    ddf = duck.execute(oracles[name]).fetchdf()
    problems = compare(name, sdf, ddf)
    assert not problems, problems
