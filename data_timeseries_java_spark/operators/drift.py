"""Distribution-drift monitoring: PSI over reference-fitted bins.

Shared by the batch query (``queries/relational_ext.q_value_psi``) and
the streaming monitor (``streaming/drift_stream.py``) — the stream
accumulates integer bin-count partials against FIXED reference edges
(fit offline, exactly how production drift monitors deploy), so the
read-time merge is lossless and stream == batch bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

N_BINS = 10


def psi_edges(tagged: DataFrame) -> DataFrame:
    """Decile edges of the REFERENCE rows per type: (etype, edges) with
    the 9 interior interpolated deciles rounded to 6 (the cross-engine
    quantization). `tagged` columns: etype, value, is_ref."""
    qs = ", ".join(str(q / 10.0) for q in range(1, N_BINS))
    return (tagged.where("is_ref")
            .groupBy("etype")
            .agg(F.expr(
                f"transform(percentile(value, array({qs})), "
                "e -> round(e, 6))").alias("edges")))


def psi_bin_counts(tagged: DataFrame, edges: DataFrame) -> DataFrame:
    """Bin every row against its type's edges: (etype, bin, c_ref,
    c_cmp) integer counts — the mergeable partial (sum-combinable
    across micro-batches or partitions)."""
    binned = (tagged.join(F.broadcast(edges), "etype")
              .select("etype", "is_ref",
                      F.size(F.filter(
                          "edges", lambda e: F.col("value") > e))
                      .alias("bin")))
    return (binned.groupBy("etype", "bin")
            .agg(F.sum(F.when(F.col("is_ref"), 1).otherwise(0))
                 .cast("long").alias("c_ref"),
                 F.sum(F.when(F.col("is_ref"), 0).otherwise(1))
                 .cast("long").alias("c_cmp")))


def psi_assemble(counts: DataFrame, edges: DataFrame) -> DataFrame:
    """Spine-complete the counts (every bin exists even when empty),
    smooth with 0.5 counts, and emit per-bin shares/contributions plus
    the per-type PSI total (window sum of 6-dp contributions)."""
    spine = (edges.select("etype",
                          F.explode(F.sequence(F.lit(0),
                                               F.lit(N_BINS - 1)))
                          .alias("bin")))
    full = (spine.join(counts, ["etype", "bin"], "left")
            .fillna(0, ["c_ref", "c_cmp"]))
    tot = full.groupBy("etype").agg(
        F.sum("c_ref").cast("long").alias("n_ref"),
        F.sum("c_cmp").cast("long").alias("n_cmp"))
    j = full.join(F.broadcast(tot), "etype")
    p_ref = (F.col("c_ref") + 0.5) / (F.col("n_ref") + 0.5 * N_BINS)
    p_cmp = (F.col("c_cmp") + 0.5) / (F.col("n_cmp") + 0.5 * N_BINS)
    contrib = (p_cmp - p_ref) * F.log(p_cmp / p_ref)
    w = Window.partitionBy("etype")
    return j.select(
        "etype", "bin", "c_ref", "c_cmp",
        F.round(p_ref, 6).alias("p_ref"),
        F.round(p_cmp, 6).alias("p_cmp"),
        F.round(contrib, 6).alias("contribution"),
        F.round(F.sum(F.round(contrib, 6)).over(w), 6).alias("psi"),
    )
