"""The operator coverage map must stay the single source of truth:
every declared query name appears in OPERATORS.md. (This test is why
the map can't silently go stale when queries are added.)"""

from __future__ import annotations

import os


def test_operator_map_covers_all_queries():
    from data_timeseries_java_spark.queries import all_queries

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "OPERATORS.md")
    text = open(path).read()
    missing = [k for k in all_queries() if k not in text]
    assert not missing, (
        f"queries missing from OPERATORS.md coverage map: {missing}")
