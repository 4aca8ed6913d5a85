"""Frame-level corpus-pipeline operators: the fused corpus build,
leakage-safe splitting, and sequence packing over an arbitrary document
DataFrame (doc_id, text, lang, source).

These are the cores of `queries/corpus.py` (which binds them to the
testdata tables and their DuckDB oracles) and of `api.CorpusEngine`
(the user-facing facade). See queries/corpus.py for the plan-shape
rationale; the fused build is pinned to <= 3 scans by
tests/test_plans.py::test_corpus_build_stays_fused.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_timeseries_java_spark.operators.dedup import ngram_contamination
from data_timeseries_java_spark.operators.text import (
    language_columns,
    quality_columns,
    tokens,
)


def corpus_build(docs: DataFrame, eval_docs: DataFrame | None = None,
                 quality_min: float = 0.55,
                 decon_k: int = 5,
                 decon_min_overlap: int = 3,
                 eval_predicate: F.Column | None = None) -> DataFrame:
    """Fused corpus build: quality + language-ID as columns of ONE
    document scan, exact-dup keeper as a window min over the content
    hash, optional decontamination against ``eval_docs`` as a broadcast
    anti-join. Output: (doc_id, predicted_lang, n_tokens, quality_score).

    When the eval set is a SLICE OF ``docs`` itself, pass
    ``eval_predicate`` instead of ``eval_docs``: both contamination
    sides become pushed filters on the document scan (3 scans total,
    the shape test_corpus_build_stays_fused pins) rather than an
    anti-join against a second read. An external benchmark table goes
    through ``eval_docs``."""
    if (eval_docs is None) == (eval_predicate is None) and \
            eval_docs is not None:
        raise ValueError("pass eval_docs OR eval_predicate, not both")
    qc = quality_columns("text")
    lc = language_columns("text", "lang")
    base = docs.select(
        "doc_id",
        qc["n_tokens"].alias("n_tokens"),
        qc["quality_score"].alias("quality_score"),
        lc["predicted_lang"].alias("predicted_lang"),
        lc["lang_match"].alias("lang_match"),
        F.md5(F.lower(F.col("text"))).alias("content_hash"))
    w = Window.partitionBy("content_hash")
    kept = (base
            .withColumn("keeper_id", F.min("doc_id").over(w))
            .where((F.col("quality_score") >= quality_min)
                   & F.col("lang_match")
                   & (F.col("doc_id") == F.col("keeper_id"))))
    if eval_predicate is not None:
        candidates = docs.where(~eval_predicate)
        eval_side = docs.where(eval_predicate)
    elif eval_docs is not None:
        eval_ids = eval_docs.select(F.col("doc_id").alias("_eval_id"))
        candidates = docs.join(eval_ids,
                               docs.doc_id == F.col("_eval_id"),
                               "left_anti")
        eval_side = eval_docs
    else:
        candidates = eval_side = None
    if candidates is not None:
        contaminated = ngram_contamination(
            candidates, eval_side,
            k=decon_k, min_overlap=decon_min_overlap).select("doc_id")
        kept = kept.join(F.broadcast(contaminated), "doc_id", "left_anti")
    return kept.select("doc_id", "predicted_lang",
                       F.col("n_tokens").cast("long").alias("n_tokens"),
                       "quality_score")


def leakage_safe_split(docs: DataFrame) -> DataFrame:
    """Group-aware train/val/test split on the content-shape
    fingerprint; every group member inherits the keeper's split.
    Output: (doc_id, group_id, split)."""
    fp = F.md5(F.concat_ws(
        " ", F.array_sort(F.array_distinct(tokens(F.col("text"))))))
    base = docs.select("doc_id", fp.alias("content_hash"))
    group_id = F.min("doc_id").over(Window.partitionBy("content_hash"))
    h = F.substring(F.md5(group_id.cast("string")), 1, 1)
    split = (F.when(h < "c", "train")
             .when(h < "e", "val")
             .otherwise("test"))
    return base.select("doc_id", group_id.alias("group_id"),
                       split.alias("split"))


def sequence_packing(docs: DataFrame, pack_budget: int = 256,
                     token_count_col: F.Column | None = None) -> DataFrame:
    """Per-source-shard pack manifest: docs join the pack their starting
    token offset falls in (exclusive running sum / budget).
    Output: (source, pack_id, n_docs, total_tokens, first_doc, last_doc).

    ``token_count_col`` overrides the budgeting unit — default is the
    whitespace-regex word count; pass ``operators/text`` BPE counts to
    budget in REAL subword tokens (what a training run sees)."""
    n_tok = (token_count_col if token_count_col is not None
             else F.size(tokens(F.col("text")))).cast("long")
    w = (Window.partitionBy("source").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    start = F.coalesce(F.sum(n_tok).over(w), F.lit(0))
    packed = docs.select(
        "source", "doc_id", n_tok.alias("n_tok"),
        F.floor(start / F.lit(float(pack_budget))).cast("long")
        .alias("pack_id"))
    return (packed.groupBy("source", "pack_id")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tok").alias("total_tokens"),
                 F.min("doc_id").alias("first_doc"),
                 F.max("doc_id").alias("last_doc")))


def temperature_sample(df: DataFrame, domain_col: str = "lang",
                       id_col: str = "doc_id",
                       alpha: float = 0.5) -> DataFrame:
    """Temperature-weighted domain mixture sampling: downsample
    over-represented domains so effective counts follow count^alpha
    (alpha=1 keeps the natural mixture, alpha→0 equalizes domains) —
    the standard rebalancing step when assembling a multi-source
    training corpus.

    Keep probability per domain: p_d = (min_count / count_d)^(1-alpha),
    so the rarest domain is kept whole. The keep DECISION is a
    deterministic hash threshold, not rand(): md5 of the doc id compared
    against p_d scaled to a 32-bit hex string — reproducible across
    runs, engines, partitionings, and cluster sizes (auditable corpus
    construction; a rand() sample is none of those).

    Shape at 100 TB: the per-domain stats frame is domain-sized (tiny)
    and broadcast; the corpus is scanned once with a narrow filter —
    no shuffle of the big side at all.
    """
    stats = df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("n_docs"))
    mn = stats.agg(F.min("n_docs").alias("_min_docs"))
    keep_p = F.pow(F.col("_min_docs") / F.col("n_docs"), F.lit(1.0 - alpha))
    rates = (stats.crossJoin(F.broadcast(mn))
             .select(domain_col, "n_docs", keep_p.alias("keep_p"),
                     F.floor(keep_p * F.lit(4294967296)).cast("bigint")
                     .alias("_thr")))
    h8 = F.upper(F.substring(
        F.md5(F.concat(F.lit("mix:"), F.col(id_col).cast("string"))), 1, 8))
    keep = ((F.col("_thr") >= F.lit(4294967296))
            | (h8 < F.lpad(F.hex(F.col("_thr")), 8, "0")))
    return (df.join(F.broadcast(rates), domain_col)
            .where(keep)
            .select(id_col, domain_col, "n_docs",
                    F.round("keep_p", 6).alias("keep_p")))


def corpus_funnel_attrition(docs: DataFrame,
                            eval_predicate: F.Column,
                            quality_min: float = 0.55,
                            decon_k: int = 5,
                            decon_min_overlap: int = 3) -> DataFrame:
    """Per-stage attrition report for the corpus-build funnel — the
    pipeline-observability table every large filtering run publishes
    next to its output: how many documents entered each stage, how many
    survived it, and the cumulative survival fraction. Stage order
    matches :func:`corpus_build` (quality → language agreement →
    exact-dup keeper → decontamination); flags are computed globally
    (keeper = min doc_id over the content hash of ALL docs, exactly as
    corpus_build decides it) and the funnel is the conditional-count
    cascade over those flags.

    Output: one row per stage — (stage_idx, stage, n_in, n_out,
    n_dropped, drop_frac, survival_frac [cumulative vs the full
    corpus]).

    Shape at 100 TB: one flags frame (the same <= 3-scan shape as
    corpus_build: quality/langid are narrow columns of one scan, the
    keeper a window min, contamination a broadcast anti-side), ONE
    global aggregate of conditional sums, and a 4-element explode of
    the result row — counters, never per-stage recounts of the
    corpus."""
    qc = quality_columns("text")
    lc = language_columns("text", "lang")
    base = docs.select(
        "doc_id",
        (qc["quality_score"] >= quality_min).alias("q_pass"),
        lc["lang_match"].alias("l_pass"),
        F.md5(F.lower(F.col("text"))).alias("content_hash"))
    w = Window.partitionBy("content_hash")
    flags = base.withColumn(
        "keeper", F.col("doc_id") == F.min("doc_id").over(w))
    contaminated = (ngram_contamination(
        docs.where(~eval_predicate), docs.where(eval_predicate),
        k=decon_k, min_overlap=decon_min_overlap)
        .select("doc_id", F.lit(True).alias("_contam")))
    flags = (flags.join(F.broadcast(contaminated), "doc_id", "left")
             .withColumn("clean", F.col("_contam").isNull()))
    one = F.lit(1)
    zero = F.lit(0)
    c = flags.agg(
        F.count(one).cast("long").alias("n0"),
        F.sum(F.when(F.col("q_pass"), one).otherwise(zero))
        .cast("long").alias("n1"),
        F.sum(F.when(F.col("q_pass") & F.col("l_pass"), one)
              .otherwise(zero)).cast("long").alias("n2"),
        F.sum(F.when(F.col("q_pass") & F.col("l_pass")
                     & F.col("keeper"), one).otherwise(zero))
        .cast("long").alias("n3"),
        F.sum(F.when(F.col("q_pass") & F.col("l_pass")
                     & F.col("keeper") & F.col("clean"), one)
              .otherwise(zero)).cast("long").alias("n4"))
    stages = [("quality", "n0", "n1"), ("language", "n1", "n2"),
              ("dedup_keeper", "n2", "n3"),
              ("decontamination", "n3", "n4")]
    rows = F.explode(F.array(*[
        F.struct(F.lit(i + 1).cast("long").alias("stage_idx"),
                 F.lit(name).alias("stage"),
                 F.col(a).alias("n_in"), F.col(b).alias("n_out"))
        for i, (name, a, b) in enumerate(stages)]))
    floor6 = lambda col: F.floor(col * 1_000_000) / 1_000_000  # noqa: E731
    return (c.select(rows.alias("r"), "n0")
            .select(F.col("r.stage_idx").alias("stage_idx"),
                    F.col("r.stage").alias("stage"),
                    F.col("r.n_in").alias("n_in"),
                    F.col("r.n_out").alias("n_out"),
                    (F.col("r.n_in") - F.col("r.n_out")).cast("long")
                    .alias("n_dropped"),
                    floor6((F.col("r.n_in") - F.col("r.n_out"))
                           / F.greatest(F.col("r.n_in"), F.lit(1)))
                    .alias("drop_frac"),
                    floor6(F.col("r.n_out")
                           / F.greatest(F.col("n0"), F.lit(1)))
                    .alias("survival_frac")))


def mixture_token_budget(docs: DataFrame, budget_tokens: int,
                         alpha: float = 0.5,
                         domain_col: str = "source",
                         text_col: str = "text") -> DataFrame:
    """Mixture planning table for a token-budgeted training run: given
    a total ``budget_tokens`` and a temperature-``alpha`` target
    mixture (weights ∝ natural_tokens^alpha, the multi-source
    rebalancing rule temperature_sample applies to documents), report
    per domain how many tokens the budget allocates and how many
    EPOCHS of the domain that implies — the repetition-factor table a
    data-mixing plan publishes before launch (epochs > 1 flags domains
    the run will repeat; ≪ 1 flags domains it will subsample).

    Output per domain: n_docs, n_tokens, natural_share, target_share,
    budget_tokens (allocated), epochs. Shares/epochs floor-quantized
    to 6 decimals.

    Shape at 100 TB: one conditional aggregate over the corpus scan
    (the token count is a narrow expression), then domain-sized
    arithmetic — the corpus is read exactly once and nothing large
    shuffles."""
    n_tok = F.size(tokens(F.col(text_col))).cast("double")
    stats = docs.groupBy(domain_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(n_tok).cast("double").alias("n_tokens"))
    tot = stats.agg(
        F.sum("n_tokens").alias("_tt"),
        F.sum(F.pow(F.col("n_tokens"), F.lit(alpha))).alias("_tw"))
    floor6 = lambda c: F.floor(c * 1_000_000) / 1_000_000  # noqa: E731
    tshare = F.pow(F.col("n_tokens"), F.lit(alpha)) / F.col("_tw")
    alloc = tshare * F.lit(float(budget_tokens))
    return (stats.crossJoin(F.broadcast(tot))
            .select(domain_col, "n_docs",
                    F.col("n_tokens").cast("long").alias("n_tokens"),
                    floor6(F.col("n_tokens") / F.col("_tt"))
                    .alias("natural_share"),
                    floor6(tshare).alias("target_share"),
                    F.floor(alloc).cast("long").alias("budget_tokens"),
                    floor6(alloc / F.col("n_tokens")).alias("epochs")))


def chunk_documents(docs: DataFrame, chunk_tokens: int = 64,
                    overlap: int = 16, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """RAG-style document chunking: fixed-size token windows with
    overlap. Chunk i of a document covers whitespace tokens
    [i*stride, i*stride + chunk_tokens) with stride = chunk_tokens -
    overlap; a document of n tokens yields 1 chunk when n <=
    chunk_tokens, else 1 + ceil((n - chunk_tokens) / stride) — so the
    last chunk always carries more than `overlap` tokens (never a
    degenerate pure-overlap tail) and every token is covered. Chunk
    identity is (doc_id, chunk_idx): stable under re-runs, the key a
    vector store upserts on.

    Shape: ONE narrow projection + one generator (explode of an
    integer sequence) — no shuffle, no UDF; tokenization and slicing
    are built-in higher-order functions inside whole-stage codegen.
    At 100 TB this is a pure map over the scan: output partitioning
    inherits the input's, and chunk fan-out is bounded by
    n_tokens/stride per document.
    """
    if overlap >= chunk_tokens:
        raise ValueError(
            f"overlap ({overlap}) must be < chunk_tokens ({chunk_tokens})")
    stride = chunk_tokens - overlap
    toks = F.filter(F.split(F.lower(F.col(text_col)), " "),
                    lambda x: x != "")
    base = (docs.select(F.col(id_col), toks.alias("_t"))
            .where(F.size("_t") > 0))
    n = F.size("_t")
    n_chunks = F.when(n <= chunk_tokens, F.lit(1)).otherwise(
        F.lit(1) + F.expr(f"(size(_t) - {chunk_tokens} + {stride - 1}) "
                          f"div {stride}"))
    ch = base.select(
        id_col, "_t",
        F.explode(F.sequence(F.lit(0), (n_chunks - 1).cast("int")))
        .alias("chunk_idx"))
    start = F.col("chunk_idx").cast("long") * stride
    piece = F.slice(F.col("_t"), (start + 1).cast("int"), chunk_tokens)
    return ch.select(
        id_col,
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        start.alias("start_tok"),
        F.size(piece).cast("long").alias("n_tokens"),
        F.array_join(piece, " ").alias("chunk_text"))
