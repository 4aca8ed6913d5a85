"""End-to-end corpus build: the composed training-data pipeline a user
actually runs — quality gate + language agreement + exact-dedup keeper
+ benchmark decontamination, in one declarative plan.

Composition is the point: each stage's semantics are the
already-oracle-checked operators (text.quality_score, text.language_id,
dedup.exact_duplicates, dedup.ngram_contamination); this query fuses
them the way a real pretraining corpus build should — quality and
language-ID as columns of ONE document scan, the dup-keeper as a window
min over the content hash, decontamination as a broadcast anti-join —
and hash-checks the COMBINED result against the stage-by-stage oracle,
so the fusion is proven semantics-preserving. Everything is one lazy
plan: no iteration, no driver actions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_timeseries_java_spark.queries.dedup import (
    DECON_EVAL_MAX_ID,
    DECON_K,
    DECON_MIN_OVERLAP,
)
from data_timeseries_java_spark.queries.dedup import (
    ORACLE as _DEDUP_ORACLE,
)
from data_timeseries_java_spark.queries.text import _QUALITY_SQL, _langid_sql
from data_timeseries_java_spark.tables import load_table

QUALITY_MIN = 0.55


def q_corpus_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kept corpus documents: quality >= 0.55, predicted language agrees
    with the declared one, exact-duplicate keeper rows only, and not
    contaminated against the doc_id < 50 eval set.

    Fused plan: quality and language-ID are narrow column expressions
    (operators/text.py `quality_columns`/`language_columns`), so the
    main stream is ONE scan of `documents` projecting both plus the
    content hash, with the dup-keeper as a window min over the hash —
    no per-stage joins of doc-count frames on doc_id. Contamination is
    the only branch that re-reads text (its shingle stream has a
    different shape); its tiny output anti-joins back as a broadcast.
    Net: 2 scans + 1 window shuffle + the shingle groupBy, vs 6 scans
    and 3 doc-count joins for the naive stage-by-stage composition.
    Core: operators/corpus.corpus_build (also behind api.CorpusEngine)."""
    from data_timeseries_java_spark.operators.corpus import corpus_build

    docs = load_table(spark, sf_dir, "documents")
    return corpus_build(docs,
                        eval_predicate=F.col("doc_id") < DECON_EVAL_MAX_ID,
                        quality_min=QUALITY_MIN, decon_k=DECON_K,
                        decon_min_overlap=DECON_MIN_OVERLAP)


PACK_BUDGET = 256


def q_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-aware train/val/test split: every member of a near-dup
    group (same content-shape fingerprint — the word-order-robust
    sorted-distinct-token hash of operators/text.fingerprint) inherits
    the split of the group's keeper (min doc_id), so near-duplicates
    can never straddle train and test — the leakage failure mode a
    per-doc hash split (`dataset_split`) cannot prevent. Same
    0-b/c-d/e-f md5 bucketing as dataset_split, applied to the GROUP id;
    one window shuffle on the fingerprint, no joins.
    Core: operators/corpus.leakage_safe_split."""
    from data_timeseries_java_spark.operators.corpus import (
        leakage_safe_split,
    )

    return leakage_safe_split(load_table(spark, sf_dir, "documents"))


def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for pretraining batches: documents are packed
    greedily in deterministic (doc_id) order into ~PACK_BUDGET-token
    packs WITHIN each source shard — a doc joins the pack its starting
    token offset falls in (exclusive running sum DIV budget). Per-shard
    windows keep the cumsum distributed (nothing global); output is the
    pack manifest a dataloader consumes.
    Core: operators/corpus.sequence_packing."""
    from data_timeseries_java_spark.operators.corpus import (
        sequence_packing,
    )

    return sequence_packing(load_table(spark, sf_dir, "documents"),
                            pack_budget=PACK_BUDGET)


QUERIES = {
    "corpus_build": q_corpus_build,
    "leakage_safe_split": q_leakage_safe_split,
    "sequence_packing": q_sequence_packing,
}

ORACLE = {
    "leakage_safe_split": """
WITH g AS (
  SELECT doc_id,
         min(doc_id) OVER (PARTITION BY md5(array_to_string(
           list_sort(list_distinct(list_filter(
             string_split(lower(text), ' '), x -> x <> ''))), ' ')))
           AS group_id
  FROM documents
)
SELECT doc_id, group_id,
       CASE WHEN substr(md5(CAST(group_id AS VARCHAR)), 1, 1) < 'c'
              THEN 'train'
            WHEN substr(md5(CAST(group_id AS VARCHAR)), 1, 1) < 'e'
              THEN 'val'
            ELSE 'test' END AS split
FROM g
""",
    "sequence_packing": f"""
WITH toks AS (
  SELECT source, doc_id,
         len(list_filter(string_split(lower(text), ' '), t -> t <> ''))
           AS n_tok
  FROM documents
), offs AS (
  SELECT source, doc_id, n_tok,
         coalesce(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS start
  FROM toks
)
SELECT source, CAST(floor(start / {float(PACK_BUDGET)}) AS BIGINT) AS pack_id,
       count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS total_tokens,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM offs
GROUP BY source, pack_id
""",
    "corpus_build": f"""
WITH quality AS ({_QUALITY_SQL}),
langid AS ({_langid_sql()}),
dup AS ({_DEDUP_ORACLE["dedup_exact"]}),
contaminated AS ({_DEDUP_ORACLE["decontaminate"]})
SELECT q.doc_id, l.predicted_lang,
       CAST(q.n_tokens AS BIGINT) AS n_tokens, q.quality_score
FROM quality q
JOIN langid l ON l.doc_id = q.doc_id AND l.lang_match
JOIN dup d ON d.doc_id = q.doc_id AND NOT d.is_duplicate
WHERE q.quality_score >= {QUALITY_MIN}
  AND q.doc_id NOT IN (SELECT doc_id FROM contaminated)
"""}


# ---- temperature-weighted domain mixture -------------------------------

MIX_ALPHA = 0.5


def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rebalance the language mixture to counts^0.5 via deterministic
    hash-threshold sampling — see operators.corpus.temperature_sample."""
    from data_timeseries_java_spark.operators.corpus import temperature_sample

    return temperature_sample(load_table(spark, sf_dir, "documents"),
                              domain_col="lang", alpha=MIX_ALPHA)


QUERIES["mixture_sample"] = q_mixture_sample

ORACLE["mixture_sample"] = f"""
WITH stats AS (
  SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang
),
mn AS (SELECT min(n_docs) AS min_docs FROM stats),
rates AS (
  SELECT lang, n_docs,
         pow(min_docs * 1.0 / n_docs, {1.0 - MIX_ALPHA}) AS keep_p,
         CAST(floor(pow(min_docs * 1.0 / n_docs, {1.0 - MIX_ALPHA})
                    * 4294967296) AS BIGINT) AS thr
  FROM stats CROSS JOIN mn
)
SELECT d.doc_id, d.lang, r.n_docs, round(r.keep_p, 6) AS keep_p
FROM documents d JOIN rates r USING (lang)
WHERE r.thr >= 4294967296
   OR upper(substr(md5('mix:' || CAST(d.doc_id AS VARCHAR)), 1, 8))
      < lpad(hex(r.thr), 8, '0')
"""


# ---- streaming corpus build, driver-gated through replay ----------------

_CORPUS_REPLAY_SINKS: dict[tuple, str] = {}


def q_corpus_stream_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus build executed through the STREAMING lane
    (`streaming/corpus_stream.py`: dedup-FIRST keyed state via
    dropDuplicatesWithinWatermark, then the stateless quality/language
    gates, per-batch decontamination in foreachBatch) and hash-matched
    against the SAME stage-by-stage DuckDB oracle as the batch
    `corpus_build` — the dedup-before-filter ordering and the
    cross-batch hash state become driver-visible.

    Replay construction encodes the two preconditions under which
    stream == batch (the operator's documented contract):

    - every exact-dup group's keeper (min doc_id) is routed to a
      strictly EARLIER file/micro-batch than the group's other members
      (id-bucket + rank-within-group file index), so first-arrival-wins
      resolves to the batch build's min-id keeper; non-keepers may
      share a batch freely (state already holds the keeper);
    - event time is a CONSTANT, so the watermark never passes the
      dedup state's horizon and nothing is evicted mid-replay
      (scale-factor-proof — real per-doc times would outrun the 1-hour
      horizon at larger SFs).

    Within each file the row order is md5-scrambled. Building this
    query RUNS the stream (laziness-guard exempt); the declared result
    is a pruned parquet scan of the corpus sink."""
    import os
    import shutil
    import tempfile
    import time as _time

    from pyspark.sql import Window

    from data_timeseries_java_spark.streaming.corpus_stream import (
        streaming_corpus_build,
    )
    from data_timeseries_java_spark.streaming.replay import (
        drive_query,
        keeper_route_file,
        write_replay_files,
    )

    cache_key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir))
    sink = _CORPUS_REPLAY_SINKS.get(cache_key)
    if sink is None or not os.path.isdir(sink):
        docs = load_table(spark, sf_dir, "documents")
        lo, hi = docs.select(F.min("doc_id"), F.max("doc_id")).first()
        n_files = 4
        routed = docs.select(
            "doc_id",
            F.to_timestamp(F.lit("2024-05-01 00:00:00")).alias("ts"),
            "text", "lang",
            keeper_route_file(n_files, int(lo), int(hi)).alias("_file"))
        work = tempfile.mkdtemp(prefix="corpus_stream_replay_")
        base = _time.time() - 1000
        write_replay_files(routed, "_file", f"{work}/in", n_files, base,
                           ["doc_id"])
        schema = "doc_id long, ts timestamp, text string, lang string"
        src = (spark.readStream.schema(schema)
               .option("maxFilesPerTrigger", 1).parquet(f"{work}/in/f*"))
        eval_docs = (docs.where(F.col("doc_id") < DECON_EVAL_MAX_ID)
                     .select("doc_id", "text"))
        q = streaming_corpus_build(spark, src, eval_docs, f"{work}/store",
                                   quality_min=QUALITY_MIN,
                                   decon_k=DECON_K,
                                   decon_min_overlap=DECON_MIN_OVERLAP)
        drive_query(q, 600, "corpus stream replay")
        sink = f"{work}/store/corpus"
        shutil.rmtree(f"{work}/in", ignore_errors=True)
        shutil.rmtree(f"{work}/store/checkpoint", ignore_errors=True)
        _CORPUS_REPLAY_SINKS[cache_key] = sink
    return (spark.read.option("basePath", sink).parquet(sink)
            .drop("batch_id")
            .select("doc_id", "predicted_lang", "n_tokens",
                    "quality_score"))


QUERIES["corpus_stream_replay"] = q_corpus_stream_replay

# same independent stage-by-stage oracle as the batch build — the gate
# proves the STREAM produces the batch-equivalent corpus
ORACLE["corpus_stream_replay"] = ORACLE["corpus_build"]


# ---- packing budgeted in REAL BPE tokens --------------------------------


def q_sequence_packing_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`sequence_packing` budgeted in REAL subword tokens: the unit is
    the committed BPE merge table's token count (operators/text.
    bpe_token_counts — replace-chain apply, no UDF) instead of the
    whitespace-word estimate, so pack boundaries land where a
    subword-tokenized training run would see them. Same per-shard
    windowed cumsum plan; the token column is one extra narrow
    expression on the same scan. The oracle re-derives the BPE count
    with the same merge-table replace chain inside the packing SQL."""
    from data_timeseries_java_spark.operators.corpus import sequence_packing
    from data_timeseries_java_spark.operators.text import (
        bpe_apply,
        bpe_serialized,
    )

    docs = load_table(spark, sf_dir, "documents")
    words = F.regexp_extract_all(F.lower(F.col("text")),
                                 F.lit("[a-z0-9]+"), 0)
    # stage the 64-rule replace chain behind named columns: inlining it
    # into sequence_packing would plant ~4 copies in the analyzed tree
    # (merged twice inside the count, the count twice inside packing) —
    # the same Catalyst blowup bpe_token_counts stages `_m` to avoid
    staged = docs.select(
        "source", "doc_id",
        F.size(words).alias("_n_words"),
        bpe_apply(bpe_serialized("text")).alias("_m"))
    staged = staged.select(
        "source", "doc_id",
        (F.col("_n_words")
         + ((F.length("_m")
             - F.length(F.replace(F.col("_m"), F.lit("~~"), F.lit(""))))
            / 2).cast("long")).alias("_n_bpe"))
    return sequence_packing(staged, pack_budget=PACK_BUDGET,
                            token_count_col=F.col("_n_bpe"))


def _packing_bpe_sql() -> str:
    from data_timeseries_java_spark.queries.text import _bpe_sql

    return f"""
WITH bpe AS ({_bpe_sql()}),
src AS (SELECT doc_id, source FROM documents),
toks AS (
  SELECT s.source, b.doc_id, b.n_bpe_tokens AS n_tok
  FROM bpe b JOIN src s ON s.doc_id = b.doc_id
), offs AS (
  SELECT source, doc_id, n_tok,
         coalesce(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS start
  FROM toks
)
SELECT source, CAST(floor(start / {float(PACK_BUDGET)}) AS BIGINT) AS pack_id,
       count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS total_tokens,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM offs
GROUP BY source, pack_id
"""


QUERIES["sequence_packing_bpe"] = q_sequence_packing_bpe
ORACLE["sequence_packing_bpe"] = _packing_bpe_sql()


# ---- funnel attrition report ---------------------------------------------


def q_corpus_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stage attrition of the corpus-build funnel (quality →
    language → dedup keeper → decontamination): n_in / n_out /
    drop_frac / cumulative survival per stage — the observability table
    a 100 TB filtering run publishes next to its output. One flags
    frame, ONE conditional-sum aggregate, a 4-row explode
    (operators/corpus.corpus_funnel_attrition)."""
    from data_timeseries_java_spark.operators.corpus import (
        corpus_funnel_attrition,
    )

    docs = load_table(spark, sf_dir, "documents")
    return corpus_funnel_attrition(
        docs, eval_predicate=F.col("doc_id") < DECON_EVAL_MAX_ID,
        quality_min=QUALITY_MIN, decon_k=DECON_K,
        decon_min_overlap=DECON_MIN_OVERLAP)


QUERIES["corpus_funnel"] = q_corpus_funnel

ORACLE["corpus_funnel"] = f"""
WITH quality AS ({_QUALITY_SQL}),
langid AS ({_langid_sql()}),
dup AS ({_DEDUP_ORACLE["dedup_exact"]}),
contaminated AS ({_DEDUP_ORACLE["decontaminate"]}),
flags AS (
  SELECT q.doc_id,
         q.quality_score >= {QUALITY_MIN} AS q_pass,
         l.lang_match AS l_pass,
         NOT d.is_duplicate AS keeper,
         q.doc_id NOT IN (SELECT doc_id FROM contaminated) AS clean
  FROM quality q
  JOIN langid l ON l.doc_id = q.doc_id
  JOIN dup d ON d.doc_id = q.doc_id
),
c AS (
  SELECT count(*) AS n0,
         sum(CASE WHEN q_pass THEN 1 ELSE 0 END) AS n1,
         sum(CASE WHEN q_pass AND l_pass THEN 1 ELSE 0 END) AS n2,
         sum(CASE WHEN q_pass AND l_pass AND keeper
                  THEN 1 ELSE 0 END) AS n3,
         sum(CASE WHEN q_pass AND l_pass AND keeper AND clean
                  THEN 1 ELSE 0 END) AS n4
  FROM flags
),
u AS (
  SELECT 1 AS stage_idx, 'quality' AS stage, n0 AS n_in, n1 AS n_out,
         n0 FROM c
  UNION ALL SELECT 2, 'language', n1, n2, n0 FROM c
  UNION ALL SELECT 3, 'dedup_keeper', n2, n3, n0 FROM c
  UNION ALL SELECT 4, 'decontamination', n3, n4, n0 FROM c
)
SELECT CAST(stage_idx AS BIGINT) AS stage_idx, stage,
       CAST(n_in AS BIGINT) AS n_in,
       CAST(n_out AS BIGINT) AS n_out,
       CAST(n_in - n_out AS BIGINT) AS n_dropped,
       floor((n_in - n_out) * 1000000.0 / greatest(n_in, 1)) / 1000000
           AS drop_frac,
       floor(n_out * 1000000.0 / greatest(n0, 1)) / 1000000
           AS survival_frac
FROM u
"""


# ---- token-budget mixture planning ----------------------------------------

BUDGET_TOKENS = 100_000


def q_mixture_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-budget allocation for a temperature-0.5 target
    mixture over a 100k-token run: natural vs target shares, allocated
    tokens, and the implied EPOCHS per source (the repetition-factor
    table a data-mixing plan publishes before launch) —
    operators/corpus.mixture_token_budget; one corpus scan."""
    from data_timeseries_java_spark.operators.corpus import (
        mixture_token_budget,
    )

    return mixture_token_budget(load_table(spark, sf_dir, "documents"),
                                budget_tokens=BUDGET_TOKENS,
                                alpha=MIX_ALPHA)


QUERIES["mixture_token_budget"] = q_mixture_token_budget

ORACLE["mixture_token_budget"] = f"""
WITH stats AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(list_filter(string_split(lower(text), ' '),
                                  t -> t <> ''))) AS DOUBLE) AS n_tokens
  FROM documents GROUP BY source
),
tot AS (
  SELECT sum(n_tokens) AS tt,
         sum(pow(n_tokens, {MIX_ALPHA})) AS tw
  FROM stats
)
SELECT source, n_docs,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       floor(n_tokens / tt * 1000000) / 1000000 AS natural_share,
       floor(pow(n_tokens, {MIX_ALPHA}) / tw * 1000000) / 1000000
           AS target_share,
       CAST(floor(pow(n_tokens, {MIX_ALPHA}) / tw
                  * {float(BUDGET_TOKENS)}) AS BIGINT) AS budget_tokens,
       floor(pow(n_tokens, {MIX_ALPHA}) / tw * {float(BUDGET_TOKENS)}
             / n_tokens * 1000000) / 1000000 AS epochs
FROM stats CROSS JOIN tot
"""


def q_packing_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing-waste report per source shard: how much of each shard's
    token budget the greedy doc-order packing actually fills — per
    source: packs, docs, tokens, mean tokens-per-pack, and the padding
    waste fraction 1 − tokens/(packs·budget) a training run pays in
    padded FLOPs. One aggregate over the SAME gated pack manifest
    (sequence_packing); exact integer ratios rounded 6."""
    from data_timeseries_java_spark.operators.corpus import (
        sequence_packing,
    )

    m = sequence_packing(load_table(spark, sf_dir, "documents"),
                         pack_budget=PACK_BUDGET)
    g = (m.groupBy("source")
         .agg(F.count(F.lit(1)).cast("long").alias("n_packs"),
              F.sum("n_docs").cast("long").alias("n_docs"),
              F.sum("total_tokens").cast("long").alias("n_tokens")))
    cap = F.col("n_packs") * PACK_BUDGET
    return g.select(
        "source", "n_packs", "n_docs", "n_tokens",
        F.round(F.col("n_tokens") / F.col("n_packs"), 6)
        .alias("mean_tokens_per_pack"),
        F.round(F.lit(1.0) - F.col("n_tokens") / cap, 6)
        .alias("waste_frac"))


QUERIES["packing_efficiency"] = q_packing_efficiency

ORACLE["packing_efficiency"] = f"""
WITH manifest AS ({ORACLE["sequence_packing"]}),
g AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_packs,
         CAST(sum(n_docs) AS BIGINT) AS n_docs,
         CAST(sum(total_tokens) AS BIGINT) AS n_tokens
  FROM manifest GROUP BY source
)
SELECT source, n_packs, n_docs, n_tokens,
       round(n_tokens * 1.0 / n_packs, 6) AS mean_tokens_per_pack,
       round(1.0 - n_tokens * 1.0 / (n_packs * {PACK_BUDGET}), 6)
         AS waste_frac
FROM g
"""


# ---- RAG chunk manifest ----------------------------------------------------

CHUNK_TOKENS = 64
CHUNK_OVERLAP = 16
_CHUNK_STRIDE = CHUNK_TOKENS - CHUNK_OVERLAP


def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG chunk manifest: fixed 64-token windows with 16-token overlap
    over every document — the retrieval-side complement to
    sequence_packing (training packs documents INTO budgets; retrieval
    splits them into overlapping windows a vector store embeds). Chunk
    identity (doc_id, chunk_idx) is stable under re-runs. One
    projection + one generator, no shuffle —
    operators/corpus.chunk_documents."""
    from data_timeseries_java_spark.operators.corpus import chunk_documents

    return chunk_documents(load_table(spark, sf_dir, "documents"),
                           chunk_tokens=CHUNK_TOKENS,
                           overlap=CHUNK_OVERLAP)


QUERIES["doc_chunks"] = q_doc_chunks

ORACLE["doc_chunks"] = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
  FROM documents
),
par AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0),
ch AS (
  SELECT doc_id, t,
         unnest(range(CASE WHEN n <= {CHUNK_TOKENS} THEN 1
                ELSE 1 + (n - {CHUNK_TOKENS} + {_CHUNK_STRIDE - 1})
                         // {_CHUNK_STRIDE} END)) AS chunk_idx
  FROM par
)
SELECT doc_id,
       CAST(chunk_idx AS BIGINT) AS chunk_idx,
       CAST(chunk_idx * {_CHUNK_STRIDE} AS BIGINT) AS start_tok,
       CAST(len(t[chunk_idx * {_CHUNK_STRIDE} + 1 :
                  chunk_idx * {_CHUNK_STRIDE} + {CHUNK_TOKENS}])
            AS BIGINT) AS n_tokens,
       array_to_string(t[chunk_idx * {_CHUNK_STRIDE} + 1 :
                         chunk_idx * {_CHUNK_STRIDE} + {CHUNK_TOKENS}],
                       ' ') AS chunk_text
FROM ch
"""
