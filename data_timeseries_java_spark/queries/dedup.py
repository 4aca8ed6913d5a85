"""Deduplication queries over the `documents` table, with DuckDB oracles.

Shingle size k=2 (word bigrams): the synthetic corpus draws from a small
shared vocabulary, so unigram sets overlap ~uniformly; bigram sets
separate the planted near-duplicates (Jaccard ≈ 0.99) from background
pairs (≈ 0.02), which is the regime LSH banding is built for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from data_timeseries_java_spark.operators.dedup import (
    DEFAULT_BAND_SIZE,
    DEFAULT_NUM_HASHES,
    containment_dedup,
    exact_duplicates,
    minhash_lsh_dedup,
    ngram_jaccard_pairs,
    simhash,
)
from data_timeseries_java_spark.tables import load_table

SHINGLE_K = 2
JACCARD_T = 0.7
CONTAINMENT_T = 0.8
NGRAM_T = 0.5
SIMHASH_BITS = 32

# ---- shared DuckDB fragments -------------------------------------------
# word-bigram shingles via list comprehension (1-indexed lists;
# range(1, len) yields i = 1..len-1 → pairs (i, i+1))

_TOKS = """
toks AS (
  SELECT doc_id, lang,
         list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id,
         unnest([t[i] || ' ' || t[i + 1] FOR i IN range(1, len(t))]) AS shingle
  FROM toks
)
"""


def _lsh_prefix(num_hashes: int, band_size: int) -> str:
    """Shared CTE chain through banded candidates + shingle sets —
    mirrors shingles → md5 lane signatures → banding → candidate join
    (functions/hashing.md5_min_signature lane slicing: component i =
    8-hex-char lane i%4 of md5('i//4:' || shingle))."""
    sig_cols = ",\n         ".join(
        f"min(substr(md5('{i // 4}:' || shingle), {1 + 8 * (i % 4)}, 8)) "
        f"AS sig_{i}" for i in range(num_hashes))
    n_bands = num_hashes // band_size
    band_selects = []
    for b in range(n_bands):
        parts = " || '|' || ".join(
            f"sig_{b * band_size + j}" for j in range(band_size))
        band_selects.append(
            f"SELECT doc_id, {b} AS band, md5({parts}) AS bucket FROM sigs")
    bands = "\nUNION ALL\n".join(band_selects)
    return f"""
WITH {_TOKS},
sigs AS (
  SELECT doc_id,
         {sig_cols}
  FROM sh GROUP BY doc_id
),
bands AS (
{bands}
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
),
ssets AS (SELECT doc_id, list(shingle) AS sh_set FROM sh GROUP BY doc_id)"""


def _minhash_sql(num_hashes: int = DEFAULT_NUM_HASHES,
                 band_size: int = DEFAULT_BAND_SIZE,
                 threshold: float = JACCARD_T) -> str:
    return f"""{_lsh_prefix(num_hashes, band_size)},
scored AS (
  SELECT c.id_a, c.id_b,
         len(list_intersect(a.sh_set, b.sh_set))
           / (len(a.sh_set) + len(b.sh_set)
              - len(list_intersect(a.sh_set, b.sh_set))) AS jac
  FROM cand c
  JOIN ssets a ON a.doc_id = c.id_a
  JOIN ssets b ON b.doc_id = c.id_b
)
SELECT id_a, id_b, floor(jac * 1000000) / 1000000 AS jaccard
FROM scored WHERE jac >= {threshold}
"""


def _containment_sql(num_hashes: int = DEFAULT_NUM_HASHES,
                     band_size: int = DEFAULT_BAND_SIZE,
                     threshold: float = 0.8) -> str:
    return f"""{_lsh_prefix(num_hashes, band_size)},
scored AS (
  SELECT c.id_a, c.id_b,
         len(list_intersect(a.sh_set, b.sh_set))
           / least(len(a.sh_set), len(b.sh_set)) AS cont,
         len(list_intersect(a.sh_set, b.sh_set))
           / (len(a.sh_set) + len(b.sh_set)
              - len(list_intersect(a.sh_set, b.sh_set))) AS jac
  FROM cand c
  JOIN ssets a ON a.doc_id = c.id_a
  JOIN ssets b ON b.doc_id = c.id_b
)
SELECT id_a, id_b,
       floor(cont * 1000000) / 1000000 AS containment,
       floor(jac * 1000000) / 1000000 AS jaccard
FROM scored WHERE cont >= {threshold}
"""


def _simhash_sql(bits: int = SIMHASH_BITS) -> str:
    # simhash stays on unigram tokens (token-level fingerprint)
    bit_sums = ",\n         ".join(
        f"sum(CASE WHEN substr(md5(tok), {j + 1}, 1) IN "
        f"('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) AS b{j}"
        for j in range(bits))
    bit_concat = " || ".join(
        f"CASE WHEN b{j} > 0 THEN '1' ELSE '0' END" for j in range(bits))
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
  FROM documents
),
tok AS (SELECT DISTINCT doc_id, unnest(t) AS tok FROM toks),
agg AS (
  SELECT doc_id,
         {bit_sums},
         count(*) AS n_tokens
  FROM tok GROUP BY doc_id
),
sim AS (
  SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
         {bit_concat} AS simhash
  FROM agg
),
clusters AS (SELECT simhash, min(doc_id) AS cluster_id FROM sim GROUP BY simhash)
SELECT s.doc_id, s.simhash, c.cluster_id, s.n_tokens
FROM sim s JOIN clusters c ON s.simhash = c.simhash
"""


_NGRAM_SQL = f"""
WITH {_TOKS},
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
shl AS (SELECT s.doc_id, t.lang, s.shingle
        FROM sh s JOIN toks t ON s.doc_id = t.doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
  FROM shl a JOIN shl b
    ON a.shingle = b.shingle AND a.lang = b.lang AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT i.id_a, i.id_b,
       floor(i.n_inter / (za.sz + zb.sz - i.n_inter) * 1000000) / 1000000 AS jaccard
FROM inter i
JOIN sizes za ON za.doc_id = i.id_a
JOIN sizes zb ON zb.doc_id = i.id_b
WHERE i.n_inter / (za.sz + zb.sz - i.n_inter) >= {NGRAM_T}
"""


# ---- Spark side ----------------------------------------------------------

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return exact_duplicates(docs)


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return minhash_lsh_dedup(docs, k=SHINGLE_K, threshold=JACCARD_T)


def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-in-doc near-dup: banded candidates scored by containment
    |A∩B| / min(|A|,|B|) — catches a short doc embedded in a long one
    (quotes, boilerplate wrapping) that Jaccard dilutes below
    threshold."""
    docs = load_table(spark, sf_dir, "documents")
    return containment_dedup(docs, k=SHINGLE_K, threshold=CONTAINMENT_T)


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return simhash(docs, bits=SIMHASH_BITS)


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, block_col="lang", k=SHINGLE_K,
                               threshold=NGRAM_T)


QUERIES = {
    "dedup_exact": q_dedup_exact,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_containment": q_dedup_containment,
    "dedup_simhash": q_dedup_simhash,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
}

ORACLE = {
    "dedup_exact": """
WITH hashed AS (
  SELECT doc_id, md5(lower(text)) AS content_hash FROM documents
),
groups AS (
  SELECT content_hash, min(doc_id) AS keeper_id, count(*) AS group_size
  FROM hashed GROUP BY content_hash
)
SELECT h.doc_id, h.content_hash, g.keeper_id, g.group_size,
       h.doc_id <> g.keeper_id AS is_duplicate
FROM hashed h JOIN groups g ON h.content_hash = g.content_hash
""",
    "dedup_minhash_lsh": _minhash_sql(),
    "dedup_containment": _containment_sql(threshold=0.8),
    "dedup_simhash": _simhash_sql(),
    "dedup_ngram_jaccard": _NGRAM_SQL,
}


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering: connected components over the MinHash-LSH
    pair graph (iterative min-label propagation; cluster id = component's
    smallest doc id; singleton docs cluster with themselves)."""
    from data_timeseries_java_spark.operators.dedup import cluster_duplicates

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_dedup(docs, k=SHINGLE_K, threshold=JACCARD_T)
    return cluster_duplicates(docs, pairs)


QUERIES["dedup_clusters"] = q_dedup_clusters

# Oracle: transitive closure by recursive CTE over the same verified pair
# graph; cluster = min reachable id (including self).
ORACLE["dedup_clusters"] = f"""
WITH RECURSIVE pairs AS (
  SELECT id_a, id_b FROM ({_minhash_sql()}) q
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM pairs
),
reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
),
labels AS (
  SELECT src AS id, least(min(dst), src) AS cluster FROM reach GROUP BY src
)
SELECT d.doc_id, coalesce(l.cluster, d.doc_id) AS cluster
FROM documents d LEFT JOIN labels l ON l.id = d.doc_id
"""


def q_dedup_keep_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end dedup decision: one kept representative per near-dup
    cluster (the component's smallest doc id) — the keep-list a corpus
    build would join against."""
    from pyspark.sql import functions as F

    clusters = q_dedup_clusters(spark, sf_dir)
    return (clusters.groupBy("cluster")
            .agg(F.count(F.lit(1)).alias("cluster_size"))
            .select(F.col("cluster").alias("kept_doc_id"), "cluster_size"))


QUERIES["dedup_keep_list"] = q_dedup_keep_list

ORACLE["dedup_keep_list"] = ORACLE["dedup_clusters"].replace(
    "SELECT d.doc_id, coalesce(l.cluster, d.doc_id) AS cluster\nFROM documents d LEFT JOIN labels l ON l.id = d.doc_id",
    """SELECT cluster AS kept_doc_id, count(*) AS cluster_size
FROM (SELECT d.doc_id, coalesce(l.cluster, d.doc_id) AS cluster
      FROM documents d LEFT JOIN labels l ON l.id = d.doc_id)
GROUP BY cluster""")


# ---- benchmark decontamination: exact k-gram overlap vs an eval set ----

DECON_K = 5
DECON_MIN_OVERLAP = 3
DECON_EVAL_MAX_ID = 50  # docs 0..49 play the held-out benchmark


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pretraining decontamination: corpus docs (id >= 50) sharing >= 3
    distinct 5-grams with any eval doc (id < 50). Eval shingles
    broadcast; the corpus shingle stream is scanned once."""
    from data_timeseries_java_spark.operators.dedup import ngram_contamination
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") >= DECON_EVAL_MAX_ID)
    eval_docs = docs.where(F.col("doc_id") < DECON_EVAL_MAX_ID)
    return ngram_contamination(corpus, eval_docs, k=DECON_K,
                               min_overlap=DECON_MIN_OVERLAP)


QUERIES["decontaminate"] = q_decontaminate

ORACLE["decontaminate"] = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
  FROM documents
),
grams AS (
  SELECT DISTINCT doc_id,
         unnest([t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
                 || ' ' || t[i+4] FOR i IN range(1, len(t) - 3)]) AS g
  FROM toks
)
SELECT c.doc_id,
       count(DISTINCT c.g) AS n_shared_ngrams,
       count(DISTINCT e.doc_id) AS n_eval_docs
FROM grams c
JOIN grams e ON c.g = e.g
WHERE c.doc_id >= {DECON_EVAL_MAX_ID} AND e.doc_id < {DECON_EVAL_MAX_ID}
GROUP BY c.doc_id
HAVING count(DISTINCT c.g) >= {DECON_MIN_OVERLAP}
"""


# ---- segment-level (ExactSubstr-lite) duplication ----------------------

SEG_LEN = 8


def q_dedup_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc fraction of fixed 8-token segments shared with another
    document — see operators.dedup.segment_duplication."""
    from data_timeseries_java_spark.operators.dedup import segment_duplication

    return segment_duplication(load_table(spark, sf_dir, "documents"),
                               seg_len=SEG_LEN)


QUERIES["dedup_segments"] = q_dedup_segments

# Same segmentation: 1-based list slice [i*8+1 : i*8+8] is 8 elements
# (DuckDB slices are inclusive), matching Spark's slice(t, i*8+1, 8).
ORACLE["dedup_segments"] = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
  FROM documents
),
segs AS (
  SELECT doc_id,
         unnest(list_transform(
             range(0, CAST(ceil(len(t) / {SEG_LEN}.0) AS BIGINT)),
             i -> md5(array_to_string(t[i*{SEG_LEN}+1 : i*{SEG_LEN}+{SEG_LEN}], ' ')))) AS seg_hash
  FROM toks
  WHERE len(t) > 0
),
seg_docs AS (
  SELECT seg_hash, count(DISTINCT doc_id) AS n_docs_with_seg
  FROM segs GROUP BY seg_hash
),
per_doc AS (
  SELECT s.doc_id,
         count(*) AS n_segments,
         count(CASE WHEN d.n_docs_with_seg > 1 THEN 1 END) AS n_dup_segments
  FROM segs s JOIN seg_docs d USING (seg_hash)
  GROUP BY s.doc_id
)
SELECT doc_id,
       CAST(n_segments AS BIGINT) AS n_segments,
       CAST(n_dup_segments AS BIGINT) AS n_dup_segments,
       floor(n_dup_segments / greatest(n_segments, 1) * 1.0 * 1000000) / 1000000 AS dup_segment_frac,
       n_dup_segments > 0 AS has_dup_segment
FROM per_doc
"""


CDC_SEG_LEN = 8
CDC_MIN_TOKS = 4


def q_dedup_segments_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined-chunking segment duplication — the boundary-
    straddling-duplicate fix over fixed chunking; see
    operators.dedup.segment_duplication_cdc."""
    from data_timeseries_java_spark.operators.dedup import (
        segment_duplication_cdc,
    )

    return segment_duplication_cdc(load_table(spark, sf_dir, "documents"),
                                   avg_seg_len=CDC_SEG_LEN,
                                   min_seg_tokens=CDC_MIN_TOKS)


QUERIES["dedup_segments_cdc"] = q_dedup_segments_cdc

# Same chunking rebuilt in SQL: md5-lane boundary marker per token
# (Spark conv(substr(md5,1,8),16,10) == DuckDB 0x-cast), chunk index =
# running count of markers over strictly-preceding positions.
ORACLE["dedup_segments_cdc"] = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
  FROM documents
),
tok_e AS (
  SELECT doc_id, s['pos'] AS pos, s['tok'] AS tok,
         CASE WHEN (('0x' || substr(md5(s['tok']), 1, 8))::BIGINT)
                   % {CDC_SEG_LEN} = 0 THEN 1 ELSE 0 END AS m
  FROM (
    SELECT doc_id,
           unnest(list_transform(range(0, len(t)),
                                 i -> {{'pos': i, 'tok': t[i+1]}})) AS s
    FROM toks WHERE len(t) > 0
  )
),
seg_toks AS (
  SELECT doc_id, pos, tok,
         COALESCE(SUM(m) OVER (PARTITION BY doc_id ORDER BY pos
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0) AS seg_idx
  FROM tok_e
),
segs AS (
  SELECT doc_id, seg_idx,
         md5(string_agg(tok, ' ' ORDER BY pos)) AS seg_hash,
         count(*) AS n_toks
  FROM seg_toks
  GROUP BY doc_id, seg_idx
  HAVING count(*) >= {CDC_MIN_TOKS}
),
seg_docs AS (
  SELECT seg_hash, count(DISTINCT doc_id) AS n_docs_with_seg
  FROM segs GROUP BY seg_hash
),
per_doc AS (
  SELECT s.doc_id,
         count(*) AS n_segments,
         count(CASE WHEN d.n_docs_with_seg > 1 THEN 1 END) AS n_dup_segments
  FROM segs s JOIN seg_docs d USING (seg_hash)
  GROUP BY s.doc_id
),
universe AS (SELECT doc_id FROM toks WHERE len(t) > 0)
SELECT u.doc_id,
       CAST(COALESCE(p.n_segments, 0) AS BIGINT) AS n_segments,
       CAST(COALESCE(p.n_dup_segments, 0) AS BIGINT) AS n_dup_segments,
       floor(COALESCE(p.n_dup_segments, 0)
             / greatest(COALESCE(p.n_segments, 0), 1) * 1.0 * 1000000)
         / 1000000 AS dup_segment_frac,
       COALESCE(p.n_dup_segments, 0) > 0 AS has_dup_segment
FROM universe u LEFT JOIN per_doc p USING (doc_id)
"""


# ---- fuzzy (edit-distance) near-dup over LSH candidates ----------------

FUZZY_MIN_SIM = 0.8


def q_dedup_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levenshtein-verified near-dup pairs over MinHash-LSH candidates
    — see operators.dedup.fuzzy_duplicates."""
    from data_timeseries_java_spark.operators.dedup import fuzzy_duplicates

    return fuzzy_duplicates(load_table(spark, sf_dir, "documents"),
                            k=SHINGLE_K, min_similarity=FUZZY_MIN_SIM)


QUERIES["dedup_fuzzy"] = q_dedup_fuzzy


def _fuzzy_sql(num_hashes: int = DEFAULT_NUM_HASHES,
               band_size: int = DEFAULT_BAND_SIZE,
               min_sim: float = FUZZY_MIN_SIM) -> str:
    sig_cols = ",\n         ".join(
        f"min(substr(md5('{i // 4}:' || shingle), {1 + 8 * (i % 4)}, 8)) "
        f"AS sig_{i}" for i in range(num_hashes))
    n_bands = num_hashes // band_size
    band_selects = []
    for b in range(n_bands):
        parts = " || '|' || ".join(
            f"sig_{b * band_size + j}" for j in range(band_size))
        band_selects.append(
            f"SELECT doc_id, {b} AS band, md5({parts}) AS bucket FROM sigs")
    bands = "\nUNION ALL\n".join(band_selects)
    return f"""
WITH {_TOKS},
sigs AS (
  SELECT doc_id,
         {sig_cols}
  FROM sh GROUP BY doc_id
),
bands AS (
{bands}
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
),
scored AS (
  SELECT c.id_a, c.id_b,
         CAST(levenshtein(da.text, db.text) AS BIGINT) AS edit_distance,
         floor((1 - levenshtein(da.text, db.text) * 1.0
                / greatest(length(da.text), length(db.text))) * 1000000)
           / 1000000 AS edit_similarity
  FROM cand c
  JOIN documents da ON da.doc_id = c.id_a
  JOIN documents db ON db.doc_id = c.id_b
)
SELECT * FROM scored WHERE edit_similarity >= {min_sim}
"""


ORACLE["dedup_fuzzy"] = _fuzzy_sql()


# ---- streaming near-dup store, driver-gated through replay ---------------

_NEARDUP_REPLAY_SINKS: dict[tuple, str] = {}


def q_neardup_stream_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MinHash-LSH near-dup pipeline executed through the STREAMING
    signature store: `documents` replayed as 3 doc-id-range files (rows
    md5-scrambled WITHIN each file, so every micro-batch sees scrambled
    arrival), each batch signatured once and banded against the
    accumulated store (`streaming/neardup_stream.py`), and the verdict
    sink hash-matched against a DuckDB oracle that re-derives the whole
    algorithm — shingles → md5 lane signatures → banding → candidate
    join → signature-agreement Jaccard estimate — independently.

    Id-range bucketing makes the stream's "earlier batch OR smaller id
    within the batch" precedence coincide with plain ``doc_id`` order,
    which is what the SQL expresses. Building this query RUNS the
    stream (laziness-guard exempt); the declared result is a pruned
    parquet scan of the verdict sink."""
    import os
    import shutil
    import tempfile
    import time as _time

    from pyspark.sql import functions as F

    from data_timeseries_java_spark.streaming.neardup_stream import (
        streaming_neardup,
    )
    from data_timeseries_java_spark.streaming.replay import (
        drive_query,
        write_replay_buckets_long,
    )

    cache_key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir))
    sink = _NEARDUP_REPLAY_SINKS.get(cache_key)
    if sink is None or not os.path.isdir(sink):
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        lo, hi = docs.select(F.min("doc_id"), F.max("doc_id")).first()
        n_files = 3
        work = tempfile.mkdtemp(prefix="neardup_stream_replay_")
        base = _time.time() - 1000
        write_replay_buckets_long(docs, F.col("doc_id"), f"{work}/in",
                                  n_files, int(lo), int(hi) - int(lo) + 1,
                                  base, ["doc_id"])
        src = (spark.readStream.schema(docs.schema)
               .option("maxFilesPerTrigger", 1).parquet(f"{work}/in/f*"))
        q = streaming_neardup(spark, src, f"{work}/store")
        drive_query(q, 600, "neardup stream replay")
        sink = f"{work}/store/verdicts"
        shutil.rmtree(f"{work}/in", ignore_errors=True)
        shutil.rmtree(f"{work}/store/checkpoint", ignore_errors=True)
        _NEARDUP_REPLAY_SINKS[cache_key] = sink
    v = (spark.read.option("basePath", sink).parquet(sink)
         .drop("batch_id"))
    return v.select("doc_id", "is_near_dup",
                    F.col("dup_of").cast("long").alias("dup_of"))


def _neardup_stream_sql(num_hashes: int = DEFAULT_NUM_HASHES,
                        band_size: int = DEFAULT_BAND_SIZE,
                        sim_threshold: float = 0.5) -> str:
    """Independent re-derivation of the streaming verdict: candidates
    from LSH banding, scored by SIGNATURE lane agreement (the unbiased
    Jaccard estimate the stream uses — NOT true shingle-set Jaccard),
    keeper = smallest preceding doc id."""
    agree = " + ".join(
        f"(CASE WHEN a.sig_{i} = b.sig_{i} THEN 1 ELSE 0 END)"
        for i in range(num_hashes))
    return f"""{_lsh_prefix(num_hashes, band_size)},
agree AS (
  SELECT c.id_a, c.id_b,
         ({agree}) * 1.0 / {num_hashes} AS frac
  FROM cand c
  JOIN sigs a ON a.doc_id = c.id_a
  JOIN sigs b ON b.doc_id = c.id_b
),
dup AS (
  SELECT id_b AS doc_id, min(id_a) AS dup_of
  FROM agree WHERE frac >= {sim_threshold} GROUP BY id_b
)
SELECT d.doc_id, (p.dup_of IS NOT NULL) AS is_near_dup,
       CAST(p.dup_of AS BIGINT) AS dup_of
FROM documents d LEFT JOIN dup p ON p.doc_id = d.doc_id
"""


QUERIES["neardup_stream_replay"] = q_neardup_stream_replay
ORACLE["neardup_stream_replay"] = _neardup_stream_sql()


# ---- streaming exact dedup, driver-gated through replay ------------------

_DEDUP_REPLAY_SINKS: dict[tuple, str] = {}


def q_dedup_stream_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup executed through the STREAMING lane
    (`streaming/dedup_stream.py` — dropDuplicatesWithinWatermark keyed
    state on the content hash, first arrival wins, cross-batch
    suppression) and hash-matched against the batch `dedup_exact`
    oracle's KEEPER rows.

    Replay construction pins the stream==batch contract exactly like
    the corpus gate: every dup group's keeper (min doc_id) is routed
    to a strictly earlier file than the group's other members
    (id-bucket + rank-within-group), so first-arrival == min-id
    keeper; event time is constant, so hash state is never evicted
    mid-replay. Within-file order is md5-scrambled; non-keepers may
    share a batch (state already holds the keeper — both are
    dropped). Building this query RUNS the stream; the declared
    result is a pruned parquet scan of the kept-rows sink."""
    import os
    import shutil
    import tempfile
    import time as _time

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from data_timeseries_java_spark.streaming.dedup_stream import (
        streaming_dedup_content,
    )
    from data_timeseries_java_spark.streaming.replay import (
        keeper_route_file,
        read_replay_sink,
        run_to_parquet_sink,
        write_replay_files,
    )

    cache_key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir))
    sink = _DEDUP_REPLAY_SINKS.get(cache_key)
    if sink is None or not os.path.isdir(sink):
        docs = load_table(spark, sf_dir, "documents")
        lo, hi = docs.select(F.min("doc_id"), F.max("doc_id")).first()
        n_files = 4
        routed = docs.select(
            "doc_id",
            F.to_timestamp(F.lit("2024-05-01 00:00:00")).alias("ts"),
            "text",
            keeper_route_file(n_files, int(lo), int(hi)).alias("_file"))
        work = tempfile.mkdtemp(prefix="dedup_stream_replay_")
        base = _time.time() - 1000
        write_replay_files(routed, "_file", f"{work}/in", n_files, base,
                           ["doc_id"])
        schema = "doc_id long, ts timestamp, text string"
        src = (spark.readStream.schema(schema)
               .option("maxFilesPerTrigger", 1).parquet(f"{work}/in/f*"))
        kept = streaming_dedup_content(src, "text", "ts")
        sink = run_to_parquet_sink(kept.select("doc_id"),
                                   f"{work}/out", f"{work}/ckpt")
        shutil.rmtree(f"{work}/in", ignore_errors=True)
        shutil.rmtree(f"{work}/ckpt", ignore_errors=True)
        _DEDUP_REPLAY_SINKS[cache_key] = sink
    return read_replay_sink(spark, sink).select("doc_id")


QUERIES["dedup_stream_replay"] = q_dedup_stream_replay

# the stream's kept set == the batch dedup's keeper rows
ORACLE["dedup_stream_replay"] = """
WITH hashed AS (
  SELECT doc_id, md5(lower(text)) AS content_hash FROM documents
),
groups AS (
  SELECT content_hash, min(doc_id) AS keeper_id
  FROM hashed GROUP BY content_hash
)
SELECT keeper_id AS doc_id FROM groups
"""


# ---- Bloom-filter decontamination ---------------------------------------

BLOOM_M = 65536
BLOOM_HASHES = 3


def q_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-bitset benchmark decontamination (same eval split as
    `decontaminate`, O(1)-memory probe side) — see
    operators.dedup.bloom_decontaminate. Bloom false positives are
    deterministic and reproduced by the oracle."""
    from data_timeseries_java_spark.operators.dedup import bloom_decontaminate
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") >= DECON_EVAL_MAX_ID)
    eval_docs = docs.where(F.col("doc_id") < DECON_EVAL_MAX_ID)
    return bloom_decontaminate(corpus, eval_docs, k=DECON_K,
                               m_bits=BLOOM_M, n_hashes=BLOOM_HASHES,
                               min_overlap=DECON_MIN_OVERLAP)


QUERIES["decontaminate_bloom"] = q_decontaminate_bloom

_BLOOM_POS = " , ".join(
    f"(('0x' || substr(md5('{i}:' || g), 1, 8))::BIGINT) % {BLOOM_M}"
    for i in range(BLOOM_HASHES))

ORACLE["decontaminate_bloom"] = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
  FROM documents
),
grams AS (
  SELECT DISTINCT doc_id,
         unnest([t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
                 || ' ' || t[i+4] FOR i IN range(1, len(t) - 3)]) AS g
  FROM toks
),
pos AS (
  SELECT doc_id, g, unnest([{_BLOOM_POS}]) AS p
  FROM grams
),
epos AS (
  SELECT DISTINCT p FROM pos WHERE doc_id < {DECON_EVAL_MAX_ID}
),
flagged AS (
  SELECT doc_id, g
  FROM pos WHERE doc_id >= {DECON_EVAL_MAX_ID}
  GROUP BY doc_id, g
  HAVING count(*) FILTER (p IN (SELECT p FROM epos)) = {BLOOM_HASHES}
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_flagged_ngrams
FROM flagged
GROUP BY doc_id
HAVING count(*) >= {DECON_MIN_OVERLAP}
"""


# ---- prefix-filtering set-similarity join --------------------------------

PREFIX_JACCARD_T = 0.5
PREFIX_JACCARD_K = 3


def q_jaccard_prefix_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All document pairs with trigram-shingle-set Jaccard >= 0.5 via prefix
    filtering (AllPairs/PPJoin — exact, no LSH false negatives) — see
    operators.dedup.jaccard_prefix_join. Both engines hash each
    shingle to the same 60-bit md5 prefix before set-building
    (round-13: cuts the verify stream ~4.9× measured; exact on the
    hashed domain by construction), and candidates pass the AllPairs
    size filter before the wide verify join. The oracle re-derives the answer with a
    DIFFERENT algorithm (exhaustive Jaccard over all share-any-hash
    pairs), so a prefix bug that loses a pair fails the hash."""
    from data_timeseries_java_spark.operators.dedup import (
        jaccard_prefix_join)

    docs = load_table(spark, sf_dir, "documents")
    return jaccard_prefix_join(docs, threshold=PREFIX_JACCARD_T,
                               k=PREFIX_JACCARD_K)


QUERIES["jaccard_prefix_join"] = q_jaccard_prefix_join

ORACLE["jaccard_prefix_join"] = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
  FROM documents
),
grams AS (SELECT DISTINCT doc_id,
       unnest([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
               FOR i IN range(1, len(t) - 1)]) AS g
       FROM toks),
sh AS (SELECT DISTINCT doc_id,
       ('0x' || substr(md5(g), 1, 15))::BIGINT AS tok
       FROM grams),
n AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nt FROM sh GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(count(*) AS BIGINT) AS n_inter
  FROM sh a JOIN sh b ON a.tok = b.tok AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT p.id_a, p.id_b, p.n_inter,
       na.nt + nb.nt - p.n_inter AS n_union,
       round(p.n_inter * 1.0 / (na.nt + nb.nt - p.n_inter), 6) AS jaccard
FROM pairs p
JOIN n na ON na.doc_id = p.id_a
JOIN n nb ON nb.doc_id = p.id_b
WHERE round(p.n_inter * 1.0 / (na.nt + nb.nt - p.n_inter), 9)
      >= {PREFIX_JACCARD_T}
"""


# ---- duplicate-family size histogram -------------------------------------


def q_dedup_family_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How duplicated is the corpus, at what multiplicity — the
    distribution of exact-duplicate family sizes (md5 of text), plus
    each bucket's share of total docs: the one-glance dedup audit that
    decides whether exact dedup is worth a pass at all. Two cascaded
    count aggregates (hash -> family size -> histogram), all integers
    except the rounded share."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    fam = (docs.groupBy(F.md5(F.col("text")).alias("h"))
           .agg(F.count(F.lit(1)).alias("family_size")))
    hist = (fam.groupBy("family_size")
            .agg(F.count(F.lit(1)).alias("n_families")))
    tot = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    return (hist.crossJoin(F.broadcast(tot))
            .select(F.col("family_size").cast("long").alias("family_size"),
                    F.col("n_families").cast("long").alias("n_families"),
                    F.round(F.col("family_size") * F.col("n_families")
                            / F.col("n_docs"), 6).alias("doc_share")))


QUERIES["dedup_family_histogram"] = q_dedup_family_histogram

ORACLE["dedup_family_histogram"] = """
WITH fam AS (
  SELECT md5(text) AS h, count(*) AS family_size
  FROM documents GROUP BY md5(text)
),
hist AS (
  SELECT family_size, count(*) AS n_families
  FROM fam GROUP BY family_size
),
tot AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents)
SELECT CAST(family_size AS BIGINT) AS family_size,
       CAST(n_families AS BIGINT) AS n_families,
       round(family_size * n_families / n_docs, 6) AS doc_share
FROM hist CROSS JOIN tot
"""


# ---- ExactSubstr-style duplicated SPANS (sliding grams, merged) ----------

SPAN_K = 8          # sliding gram width (tokens)
SPAN_FLAG_FRAC = 0.2


def q_dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc maximal duplicated-substring spans: sliding 8-token
    grams occurring >= 2 times anywhere in the corpus, merged per doc
    into maximal spans with overlap-free token accounting — the
    suffix-array ExactSubstr result reached by hashing
    (operators.dedup.duplicated_substring_spans; the disjoint-chunk
    variant is dedup_segments)."""
    from data_timeseries_java_spark.operators.dedup import (
        duplicated_substring_spans)

    return duplicated_substring_spans(
        load_table(spark, sf_dir, "documents"),
        k=SPAN_K, flag_frac=SPAN_FLAG_FRAC)


QUERIES["dedup_substring_spans"] = q_dedup_substring_spans

ORACLE["dedup_substring_spans"] = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
  FROM documents
),
grams AS (
  SELECT doc_id,
         unnest(range(0, greatest(len(t) - {SPAN_K} + 1, 0))) AS pos,
         unnest(list_transform(range(1, greatest(len(t) - {SPAN_K} + 2, 1)),
                i -> array_to_string(t[i:i + {SPAN_K - 1}], ' '))) AS gram
  FROM toks
),
gh AS (SELECT doc_id, pos, substr(md5(gram), 1, 16) AS h FROM grams),
dup AS (SELECT h FROM gh GROUP BY h HAVING count(*) >= 2),
dpos AS (SELECT doc_id, pos FROM gh JOIN dup USING (h)),
isl AS (
  SELECT doc_id, pos,
         CASE WHEN lag(pos) OVER w IS NULL
                   OR pos - lag(pos) OVER w > {SPAN_K - 1}
              THEN 1 ELSE 0 END AS f
  FROM dpos WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
isl2 AS (
  SELECT doc_id, pos,
         sum(f) OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM isl
),
spans AS (
  SELECT doc_id, grp, min(pos) AS s, max(pos) + {SPAN_K - 1} AS e,
         count(*) AS n_grams_in
  FROM isl2 GROUP BY doc_id, grp
),
pd AS (
  SELECT doc_id,
         sum(n_grams_in) AS n_dup_grams,
         count(*) AS n_dup_spans,
         sum(e - s + 1) AS dup_tokens,
         max(e - s + 1) AS longest_span
  FROM spans GROUP BY doc_id
)
SELECT CAST(tk.doc_id AS BIGINT) AS doc_id,
       CAST(len(tk.t) AS BIGINT) AS n_tokens,
       CAST(coalesce(pd.n_dup_grams, 0) AS BIGINT) AS n_dup_grams,
       CAST(coalesce(pd.n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
       CAST(coalesce(pd.dup_tokens, 0) AS BIGINT) AS dup_tokens,
       CAST(coalesce(pd.longest_span, 0) AS BIGINT) AS longest_span,
       floor(coalesce(pd.dup_tokens, 0) * 1000000.0
             / greatest(len(tk.t), 1)) / 1000000 AS dup_frac,
       floor(coalesce(pd.dup_tokens, 0) * 1000000.0
             / greatest(len(tk.t), 1)) / 1000000 >= {SPAN_FLAG_FRAC}
           AS flagged
FROM toks tk LEFT JOIN pd ON pd.doc_id = tk.doc_id
"""
