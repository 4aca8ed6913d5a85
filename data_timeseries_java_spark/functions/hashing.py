"""Engine-portable deterministic hashing primitives.

Everything here reproduces bit-exactly in any SQL engine with md5() and
64-bit integer arithmetic — deliberately avoiding Spark-specific hashes
(xxhash64/murmur) and float transcendentals, so the DuckDB oracle tier
can mirror each derivation (see queries/dedup.py, queries/similarity.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

LCG_A = 1103515245
LCG_C = 12345
LCG_M = 2**31


def md5_min_signature(shingle: Column, seed: int) -> Column:
    """MinHash component: the lexicographic MIN over a group of
    ``md5(seed ':' shingle)`` hex digests is a uniform permutation
    sample — aggregate with F.min."""
    return F.md5(F.concat(F.lit(f"{seed}:"), shingle))


def md5_band_bucket(sig_cols: list[Column]) -> Column:
    """LSH band bucket: md5 over '|'-joined signature components."""
    return F.md5(F.concat_ws("|", *sig_cols))


def lcg_uniform(index: Column) -> Column:
    """Deterministic pseudo-uniform in [-0.5, 0.5) from an integer index
    via a linear congruential generator — portable randomness for LSH
    hyperplanes (float transcendentals like sin() differ across libm
    implementations; integer arithmetic never does)."""
    return (((F.lit(LCG_A) * index + F.lit(LCG_C)) % F.lit(LCG_M))
            / F.lit(LCG_M) - F.lit(0.5))
