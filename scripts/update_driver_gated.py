"""Regenerate the _DRIVER_GATED set in queries/__init__.py from every
CORRECTNESS_r*.json present (names with a green three-way match). Run
at the start of each round, after the driver writes the previous
round's file — newly gated queries then rotate out of the sampled
prefix and the next batch of not-yet-gated queries rotates in.

Prints the updated count; rewrites the ``_DRIVER_GATED = frozenset({...})``
literal in place, failing loudly if the literal can't be located (a
silent no-op would leave the gated set stale and skew the driver's
sampling prefix).
"""

from __future__ import annotations

import glob
import json
import os
import re
import textwrap

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REG = os.path.join(ROOT, "data_timeseries_java_spark", "queries",
                   "__init__.py")


def gated_names() -> list[str]:
    names: set[str] = set()
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        for name, row in json.load(open(path)).items():
            # hash_match False = a real value mismatch (stays ungated so
            # it keeps getting sampled); absent/None = rows-only check,
            # the strongest gate that query can have
            if (row.get("rows_match") and row.get("schema_match")
                    and row.get("err") is None
                    and row.get("hash_match") is not False):
                names.add(name)
    return sorted(names)


def main() -> None:
    names = gated_names()
    body = textwrap.fill(
        ", ".join(f'"{n}"' for n in names), width=72,
        initial_indent="    ", subsequent_indent="    ")
    src = open(REG).read()
    new, n_sub = re.subn(
        r"_DRIVER_GATED = frozenset\(\{.*?\}\)",
        "_DRIVER_GATED = frozenset({\n" + body + ",\n})",
        src, count=1, flags=re.S)
    if n_sub != 1:
        raise SystemExit(
            f"_DRIVER_GATED literal not found in {REG}; refusing the "
            "silent no-op — update the regex to match the current shape")
    open(REG, "w").write(new)
    print(f"_DRIVER_GATED <- {len(names)} names from "
          f"{len(glob.glob(os.path.join(ROOT, 'CORRECTNESS_r*.json')))} "
          f"CORRECTNESS files")


if __name__ == "__main__":
    main()
