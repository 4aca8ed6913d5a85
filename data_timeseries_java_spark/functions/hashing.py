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


# one md5 digest = 32 hex chars = four independent 8-hex-char (32-bit)
# lanes, so 16 signature components cost 4 digests per shingle, not 16
MD5_LANES = 4


def md5_min_signature(shingle: Column, seed: int) -> Column:
    """MinHash component ``seed``: an 8-hex-char lane sliced out of
    ``md5(seed//4 ':' shingle)``. The lexicographic MIN over a group of
    these lanes is a uniform permutation sample — aggregate with F.min.
    Lane-slicing quarters the md5 evaluations (the hot cost of
    signature building: measured 2.7s → target <1.5s at sf0.1), and
    Catalyst's codegen subexpression elimination computes each shared
    digest once per aggregate row. Portable: DuckDB mirrors it as
    ``substr(md5(...), 1 + 8*lane, 8)``."""
    digest = F.md5(F.concat(F.lit(f"{seed // MD5_LANES}:"), shingle))
    return F.substring(digest, 1 + 8 * (seed % MD5_LANES), 8)


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
