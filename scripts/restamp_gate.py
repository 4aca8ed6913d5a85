"""Re-stamp every gate-ledger hash under the CURRENT hash algorithm.

ONLY legitimate use: the ``impl_hash`` ALGORITHM itself changed (it
covers more or different surface), so every stored hash mismatches and
the whole registry would un-gate — which breaks the staleness rotation
(the driver's 50-lane sample degenerates to registry-prefix order).

This is NOT a laundering vector when run under its license:
- run at round start, BEFORE any engine-code edits, so "current
  source" is byte-identical to what the driver verified for each
  gated lane under the OLD algorithm (a gated lane is by definition
  hash-valid, i.e. unchanged since its stamp over the old surface);
- stamp ROUNDS are preserved verbatim — no freshness is invented;
- any helper-body drift the old algorithm missed (the gap the new
  algorithm closes) already happened and is already backstopped by
  the full local oracle sweep; going forward the new hash catches it.

Refuses to run if the working tree has engine-code modifications.
"""

from __future__ import annotations

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

PKG_DIR = "data_timeseries_java_spark"


def main() -> None:
    dirty = subprocess.run(
        ["git", "diff", "--name-only", "HEAD", "--", PKG_DIR],
        cwd=ROOT, capture_output=True, text=True).stdout.split()
    dirty = [p for p in dirty if not p.endswith("_gate.py")]
    if dirty:
        sys.exit(f"refusing: engine modifications present: {dirty}")

    import update_driver_gated as udg
    from data_timeseries_java_spark.queries import (_registry_queries,
                                                    all_oracles)
    from data_timeseries_java_spark.queries._hash import impl_hash

    queries = _registry_queries()
    oracles = all_oracles()
    old = udg.load_old_gate()
    gate = {name: (rnd, impl_hash(queries[name], oracles.get(name, "")))
            for name, (rnd, _) in old.items() if name in queries}
    changed = sum(1 for n in gate if gate[n][1] != old[n][1])
    udg.write_gate(gate)
    print(f"RESTAMP <- {len(gate)} entries, {changed} hashes updated, "
          f"rounds preserved")


if __name__ == "__main__":
    sys.path.insert(0, os.path.join(ROOT, "scripts"))
    main()
