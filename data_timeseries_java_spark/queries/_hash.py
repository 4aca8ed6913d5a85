"""Implementation hashing for staleness-aware driver gating.

The driver samples a 50-query prefix of ``all_queries()`` each round.
Gating a query (``_gate.py``) moves it out of that prefix — but a gate
must FOLLOW the code: a lane whose implementation changed after its
last green driver row needs re-verification, not a stale pass. Each
gate entry therefore stores the implementation hash at stamp time;
``all_queries()`` re-computes the hash and un-gates on mismatch.

The hash covers, per query:
- the query function's own source (``inspect.getsource``),
- its DuckDB oracle SQL string (the other half of the contract),
- the file contents of every package module the query's defining
  module (transitively) imports from ``data_timeseries_java_spark``
  EXCLUDING the ``queries`` subpackage itself — i.e. the operator /
  function / streaming implementation the query runs through. The
  queries subpackage is excluded so that editing one query module does
  not un-gate every other module's lanes; the function-level source
  covers the query's own logic and the oracle string covers shared
  in-module SQL preludes (they are expanded into each ORACLE entry at
  import time).

A change anywhere in that closure flips the hash and the lane sorts
back into the sampled prefix, stalest-first among its peers.
"""

from __future__ import annotations

import ast
import hashlib
import importlib.util
import inspect
from functools import lru_cache

PKG = "data_timeseries_java_spark"
_QUERIES_PKG = PKG + ".queries"


@lru_cache(maxsize=None)
def _module_file(modname: str) -> str | None:
    try:
        spec = importlib.util.find_spec(modname)
    except (ImportError, ValueError):
        return None
    if spec is None or spec.origin in (None, "built-in", "frozen"):
        return None
    return spec.origin


@lru_cache(maxsize=None)
def _module_source(modname: str) -> bytes:
    path = _module_file(modname)
    if path is None:
        return b""
    with open(path, "rb") as f:
        return f.read()


@lru_cache(maxsize=None)
def _direct_deps(modname: str) -> frozenset[str]:
    """Package modules directly imported by ``modname`` (resolved to
    real modules — ``from pkg.operators import complete_candles`` counts
    as a dep on ``pkg.operators``, whose own imports pull the
    submodules transitively)."""
    src = _module_source(modname)
    if not src:
        return frozenset()
    deps: set[str] = set()
    tree = ast.parse(src)
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for alias in node.names:
                if alias.name.startswith(PKG):
                    deps.add(alias.name)
        elif isinstance(node, ast.ImportFrom) and node.module:
            if node.module.startswith(PKG):
                deps.add(node.module)
                # `from pkg.operators import candles`-style submodule
                # imports: count the submodule too when it resolves
                for alias in node.names:
                    sub = f"{node.module}.{alias.name}"
                    if _module_file(sub) is not None:
                        deps.add(sub)
    return frozenset(d for d in deps if _module_file(d) is not None)


@lru_cache(maxsize=None)
def _impl_closure(modname: str) -> tuple[str, ...]:
    """Transitive package deps of ``modname``, excluding the queries
    subpackage (sorted, stable)."""
    seen: set[str] = set()
    stack = [d for d in _direct_deps(modname)
             if not d.startswith(_QUERIES_PKG)]
    while stack:
        m = stack.pop()
        if m in seen:
            continue
        seen.add(m)
        stack.extend(d for d in _direct_deps(m)
                     if d not in seen and not d.startswith(_QUERIES_PKG))
    return tuple(sorted(seen))


def impl_hash(fn, oracle: str) -> str:
    """16-hex-char implementation hash for one declared query."""
    h = hashlib.sha256()
    try:
        h.update(inspect.getsource(fn).encode())
    except (OSError, TypeError):
        # non-introspectable callable (C partial, exec'd) — fall back to
        # the whole defining-module source so changes still flip the hash
        h.update(_module_source(getattr(fn, "__module__", "") or ""))
    h.update(b"\x00")
    h.update(oracle.encode())
    for dep in _impl_closure(getattr(fn, "__module__", "") or ""):
        h.update(b"\x00")
        h.update(dep.encode())
        h.update(b"\x00")
        h.update(_module_source(dep))
    return h.hexdigest()[:16]
