from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")


@pytest.fixture(scope="session")
def spark():
    from data_timeseries_java_spark import get_spark

    # The suite runs with ANSI ON — the opposite of the engine's own
    # session default (session.py disables it for the reference's
    # NaN-propagating corr semantics). Every operator must be correct
    # under EITHER posture (functions/stats.py::safe_corr et al.), so
    # the whole suite — including the full DuckDB-oracle tier — is the
    # standing proof of posture independence; production sessions keep
    # ANSI off as belt-and-suspenders, not as a correctness
    # requirement. SPARK_GRAFT_TEST_ANSI=false restores the old
    # posture for A/B debugging.
    ansi = os.environ.get("SPARK_GRAFT_TEST_ANSI", "true")
    s = get_spark("engine-tests", shuffle_partitions=4,
                  extra_conf={"spark.sql.ansi.enabled": ansi})
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))
