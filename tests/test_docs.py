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


def test_driver_prefix_covers_ungated_queries():
    """The driver's correctness gate samples the first 50 registry
    entries each round, and ungated queries sort first (stable module
    order), so a round that adds more than 50 new queries leaves a
    backlog: the first 50 get checked and gated by the next rotation,
    the rest sort to the front of the following round's sample. The
    unbounded-growth failure mode this guards is queries that
    STRUCTURALLY never get a driver row — i.e. names with no ledger
    entry at all. Bound those at 2 rounds' budget (100). Hash-
    invalidated entries (implementation edited since the last green
    stamp) are deliberately NOT counted against the bound: a round
    that touches a shared helper invalidates every consuming lane at
    once (the r14 transitive impl hash working as designed — 140 lanes
    flipped in r15's optimization pass), they still sort first for
    re-verification, and the backlog self-heals at 50/round; failing
    the suite over it would punish exactly the conservative hashing
    the gate machinery is built on."""
    from data_timeseries_java_spark.queries import (
        _gate_ledger, _registry_queries, all_queries, ungated_names)

    reg = _registry_queries()
    never_stamped = [n for n in reg if n not in _gate_ledger()]
    assert len(never_stamped) <= 100, (
        f"{len(never_stamped)} queries have never had a driver gate "
        f"row; run scripts/update_driver_gated.py and stop adding "
        f"queries until it clears: {never_stamped[:10]}")
    # every ungated query must sit in the first len(ungated) slots —
    # i.e. ungated-first ordering itself must not be broken
    keys = list(all_queries())
    ungated = ungated_names()
    prefix = set(keys[:len(ungated)])
    missing = [k for k in ungated if k not in prefix]
    assert not missing, f"ungated queries outside the prefix: {missing}"


def test_readme_quickstart_examples_run(spark):
    """Every ```python block in README.md's Quickstart section executes
    verbatim (shared namespace, in order) and its result frames are
    non-empty — the entry-path examples cannot rot."""
    import re

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "README.md")
    text = open(path).read()
    section = text.split("## Quickstart", 1)[1].split("\n## ", 1)[0]
    blocks = re.findall(r"```python\n(.*?)```", section, flags=re.S)
    assert len(blocks) == 4, "expected one example per facade"
    ns: dict = {}
    for block in blocks:
        exec(compile(block, "README.md", "exec"), ns)  # noqa: S102
    # the examples' own spark is the shared test session (getOrCreate)
    for var in ("corr", "kept", "splits", "packs", "report", "chosen",
                "meta", "stats", "resized"):
        assert ns[var].count() > 0, f"README example frame {var} is empty"
