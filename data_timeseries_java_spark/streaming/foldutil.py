"""Shared helper for the fold-family stateful streams (EMA / Holt /
Kalman / tick bars / imbalance bars / SCD2): materialize one key's
WHOLE micro-batch before sorting and folding.

Why this must exist: ``applyInPandasWithState`` hands the key's rows as
an ITERATOR of Arrow chunks (chunk size = ``spark.sql.execution.arrow.
maxRecordsPerBatch``). A fold that sorts each chunk independently is
only correct if every chunk is internally ordered relative to the
others — but the replay harness md5-scrambles row order inside every
file precisely so operators see out-of-order arrival, so one key's
rows CAN straddle chunks out of time order. The order contract these
folds document covers the whole micro-batch; the sort must too.

Memory: one key's rows for one trigger — the same bound the chunked
path already had to honor for its state carry to be meaningful, and
orders of magnitude below the windowed-aggregation state these
operators replace. For a key so hot that a single trigger's rows blow
executor memory, the fix is trigger sizing (maxFilesPerTrigger /
maxOffsetsPerTrigger), not chunk-wise folding — which would be wrong,
not just slow.
"""

from __future__ import annotations


def whole_batch(pdf_iter, sort_cols):
    """Concatenate all Arrow chunks of one key's micro-batch and sort
    by ``sort_cols``; returns None for an empty batch (state-timeout
    invocations hand an empty iterator)."""
    import pandas as pd

    chunks = [pdf for pdf in pdf_iter if len(pdf)]
    if not chunks:
        return None
    pdf = chunks[0] if len(chunks) == 1 else pd.concat(
        chunks, ignore_index=True)
    return pdf.sort_values(sort_cols)
