"""Scalar/column function library.

hashing  — engine-portable deterministic hashing (md5-hex derived
           signatures, integer-LCG pseudo-randomness) used by dedup,
           similarity, and fingerprinting so every operator stays
           oracle-checkable across engines.
vectors  — JVM-side vector math over array columns (dot, norm, cosine)
           via higher-order functions; no Python in the hot path.
skew     — key-salting helpers for hot-key aggregations and joins.
stats    — ANSI-posture-independent aggregates (safe_corr).
"""

from data_timeseries_java_spark.functions.hashing import (
    lcg_uniform,
    md5_band_bucket,
    md5_min_signature,
)
from data_timeseries_java_spark.functions.skew import salted_sum
from data_timeseries_java_spark.functions.stats import safe_corr
from data_timeseries_java_spark.functions.vectors import cosine, dot, norm

__all__ = [
    "md5_min_signature",
    "md5_band_bucket",
    "lcg_uniform",
    "dot",
    "norm",
    "cosine",
    "salted_sum",
    "safe_corr",
]
