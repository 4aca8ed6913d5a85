"""Similarity-search queries over `embeddings`, with DuckDB oracles.

Cross-engine float note: dot products are double-precision sums whose
order differs between engines; outputs are rounded and rankings use
round(cosine, 9) so a last-ulp difference cannot flip a rank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_timeseries_java_spark.operators.similarity import (
    LCG_A,
    LCG_C,
    LCG_M,
    ann_lsh_topk,
    cosine_pairs,
    knn_bruteforce,
)
from data_timeseries_java_spark.tables import load_table

# p99 of within-label cosine on this corpus is ~0.295 (max 0.475): 0.3
# yields a meaningful near-dup set; 0.9 would gate on an empty result.
NEARDUP_T = 0.3
KNN_K = 10
N_QUERIES = 10
DIM = 64
N_PLANES = 8
N_TABLES = 4
# label cardinality of the driver's embeddings fixture (uniform blocks);
# used with the parquet footer row count to hint the kernel dispatcher
# without an eager job (test_embeddings_label_universe pins it)
EMB_N_LABELS = 10

# vector components with 0-based dim index; DuckDB zips parallel unnests
_COMP = """
comp AS (
  SELECT vec_id, label,
         unnest(embedding) AS x,
         unnest(generate_series(0, len(embedding) - 1)) AS dim
  FROM embeddings
),
norms AS (
  SELECT vec_id, sqrt(sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS nrm
  FROM comp GROUP BY vec_id
)
"""

_NEARDUP_SQL = f"""
WITH {_COMP},
dots AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         sum(CAST(a.x AS DOUBLE) * CAST(b.x AS DOUBLE)) AS dot
  FROM comp a JOIN comp b
    ON a.dim = b.dim AND a.label = b.label AND a.vec_id < b.vec_id
  GROUP BY a.vec_id, b.vec_id
)
SELECT d.id_a, d.id_b, round(d.dot / (na.nrm * nb.nrm), 6) AS cosine
FROM dots d
JOIN norms na ON na.vec_id = d.id_a
JOIN norms nb ON nb.vec_id = d.id_b
WHERE d.dot / (na.nrm * nb.nrm) >= {NEARDUP_T}
"""

_KNN_SQL = f"""
WITH {_COMP},
dots AS (
  SELECT q.vec_id AS query_id, c.vec_id AS nbr_id,
         sum(CAST(q.x AS DOUBLE) * CAST(c.x AS DOUBLE)) AS dot
  FROM comp q JOIN comp c
    ON q.dim = c.dim AND q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
  GROUP BY q.vec_id, c.vec_id
),
scored AS (
  SELECT d.query_id, d.nbr_id, d.dot / (nq.nrm * nc.nrm) AS cosine
  FROM dots d
  JOIN norms nq ON nq.vec_id = d.query_id
  JOIN norms nc ON nc.vec_id = d.nbr_id
),
ranked AS (
  SELECT query_id, nbr_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round(cosine, 9) DESC, nbr_id ASC) AS rank
  FROM scored
)
SELECT query_id, nbr_id, CAST(rank AS BIGINT) AS rank,
       round(cosine, 6) AS cosine
FROM ranked WHERE rank <= {KNN_K}
"""

_ANN_SQL = f"""
WITH {_COMP},
planes AS (
  SELECT p.plane, d.dim,
         ((({LCG_A} * (p.plane * {DIM} + d.dim) + {LCG_C}) % {LCG_M})
          / {LCG_M}.0 - 0.5) AS w
  FROM (SELECT unnest(generate_series(0, {N_PLANES * N_TABLES - 1})) AS plane) p
  CROSS JOIN (SELECT unnest(generate_series(0, {DIM - 1})) AS dim) d
),
pdots AS (
  SELECT c.vec_id, p.plane, sum(CAST(c.x AS DOUBLE) * p.w) AS dot
  FROM comp c JOIN planes p ON c.dim = p.dim
  GROUP BY c.vec_id, p.plane
),
sigs AS (
  SELECT vec_id, CAST(plane // {N_PLANES} AS INTEGER) AS tbl,
         string_agg(CASE WHEN dot >= 0 THEN '1' ELSE '0' END, ''
                    ORDER BY plane % {N_PLANES}) AS bucket
  FROM pdots GROUP BY vec_id, CAST(plane // {N_PLANES} AS INTEGER)
),
cand AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS nbr_id
  FROM sigs q JOIN sigs c
    ON q.tbl = c.tbl AND q.bucket = c.bucket AND q.vec_id <> c.vec_id
  WHERE q.vec_id < {N_QUERIES}
),
dots AS (
  SELECT cd.query_id, cd.nbr_id,
         sum(CAST(a.x AS DOUBLE) * CAST(b.x AS DOUBLE)) AS dot
  FROM cand cd
  JOIN comp a ON a.vec_id = cd.query_id
  JOIN comp b ON b.vec_id = cd.nbr_id AND b.dim = a.dim
  GROUP BY cd.query_id, cd.nbr_id
),
scored AS (
  SELECT d.query_id, d.nbr_id, d.dot / (nq.nrm * nc.nrm) AS cosine
  FROM dots d
  JOIN norms nq ON nq.vec_id = d.query_id
  JOIN norms nc ON nc.vec_id = d.nbr_id
),
ranked AS (
  SELECT query_id, nbr_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round(cosine, 9) DESC, nbr_id ASC) AS rank
  FROM scored
)
SELECT query_id, nbr_id, CAST(rank AS BIGINT) AS rank,
       round(cosine, 6) AS cosine
FROM ranked WHERE rank <= {KNN_K}
"""


def q_neardup_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_timeseries_java_spark.operators.similarity import (
        cosine_pairs_matrix,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    # matrix kernel: 2.5x faster than the per-pair zip_with plan at sf0.1
    # (2.1s vs 5.2s), identical output (equality-tested in the suite)
    return cosine_pairs_matrix(emb, block_col="label", threshold=NEARDUP_T)


def q_neardup_cosine_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup via the kernel DISPATCHER: per-pair zip_with
    plan vs per-block BLAS Gram matrix, chosen by the largest block size.
    The hint comes from PRECOMPUTED stats — parquet footer row count /
    the fixture's label cardinality — not from an eager count job over
    the embeddings corpus at plan-build time (the dispatcher's contract;
    at production scale the same number comes from ANALYZE/catalog
    stats). Plan-pinned at both sizes in tests/test_plans.py; output and
    oracle identical to neardup_cosine."""
    from data_timeseries_java_spark.operators.similarity import (
        cosine_pairs_auto,
    )
    from data_timeseries_java_spark.tables import parquet_row_count

    emb = load_table(spark, sf_dir, "embeddings")
    # labels are uniform over EMB_N_LABELS by fixture construction
    # (asserted in tests); a skewed universe would only shade the
    # kernel choice — both kernels emit identical rows either way
    max_block = -(-parquet_row_count(sf_dir, "embeddings") // EMB_N_LABELS)
    return cosine_pairs_auto(emb, block_col="label", threshold=NEARDUP_T,
                             max_block_rows=max_block)


def q_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < N_QUERIES)
    return knn_bruteforce(emb, queries, k=KNN_K)


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < N_QUERIES).select("vec_id")
    return ann_lsh_topk(emb, queries, k=KNN_K,
                        n_planes=N_PLANES, n_tables=N_TABLES, dim=DIM)


QUERIES = {
    "neardup_cosine": q_neardup_cosine,
    "neardup_cosine_auto": q_neardup_cosine_auto,
    "knn_bruteforce": q_knn_bruteforce,
    "ann_lsh": q_ann_lsh,
}

ORACLE = {
    "neardup_cosine": _NEARDUP_SQL,
    # dispatcher variant: kernel choice is a physical-plan decision,
    # results and oracle unchanged
    "neardup_cosine_auto": _NEARDUP_SQL,
    "knn_bruteforce": _KNN_SQL,
    "ann_lsh": _ANN_SQL,
}


# ---- IVF ANN: coarse-quantize to centroid lists, probe nearest lists ----

N_CENTROIDS_STRIDE = 50  # centroid seed set: vec_id % 50 == 0
N_PROBE = 3
# nlist is a BUILD-TIME constant in any production IVF (FAISS trains a
# fixed list count regardless of corpus size). The round-11 outlier
# audit caught the un-capped stride rule scaling k WITH the corpus —
# O(n·k) = O(n²/stride) assignment work, 10,000 centroids at the 100x
# replica decade (SCALE.md §outlier-audit). The cap pins the list
# count: ids below STRIDE*LISTS seed, so every oracle SF and the sf0.1
# bench (vec_id < 5000 throughout) produce byte-identical results,
# while replica decades hold k = 100.
N_IVF_LISTS = 100
IVF_SEED_CAP = N_CENTROIDS_STRIDE * N_IVF_LISTS


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k: vectors are partitioned into centroid
    lists (deterministic seed centroids: every 50th vector below the
    fixed-nlist cap — a k-means refinement drops into the same
    machinery); each query probes its 3 nearest lists and
    exact-reranks only those candidates."""
    from data_timeseries_java_spark.operators.similarity import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    centroids = emb.where((F.col("vec_id") % N_CENTROIDS_STRIDE == 0)
                          & (F.col("vec_id") < IVF_SEED_CAP))
    queries = emb.where(F.col("vec_id") < N_QUERIES).select("vec_id")
    return ivf_topk(emb, queries, centroids, k=KNN_K, n_probe=N_PROBE)


QUERIES["ann_ivf"] = q_ann_ivf

ORACLE["ann_ivf"] = f"""
WITH {_COMP},
cent AS (
  SELECT vec_id AS centroid_id, dim, x FROM comp
  WHERE vec_id % {N_CENTROIDS_STRIDE} = 0 AND vec_id < {IVF_SEED_CAP}
),
cnorms AS (
  SELECT centroid_id, sqrt(sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS nrm
  FROM cent GROUP BY centroid_id
),
vc AS (  -- cosine of every vector to every centroid
  SELECT v.vec_id, c.centroid_id,
         sum(CAST(v.x AS DOUBLE) * CAST(c.x AS DOUBLE)) AS dot
  FROM comp v JOIN cent c ON v.dim = c.dim
  GROUP BY v.vec_id, c.centroid_id
),
vcs AS (
  SELECT vc.vec_id, vc.centroid_id,
         vc.dot / (n.nrm * cn.nrm) AS cos
  FROM vc JOIN norms n ON n.vec_id = vc.vec_id
  JOIN cnorms cn ON cn.centroid_id = vc.centroid_id
),
assign AS (
  SELECT vec_id, centroid_id FROM (
    SELECT vec_id, centroid_id,
           row_number() OVER (PARTITION BY vec_id
             ORDER BY round(cos, 9) DESC, centroid_id ASC) AS rnk
    FROM vcs) WHERE rnk = 1
),
probes AS (
  SELECT vec_id AS query_id, centroid_id FROM (
    SELECT vec_id, centroid_id,
           row_number() OVER (PARTITION BY vec_id
             ORDER BY round(cos, 9) DESC, centroid_id ASC) AS rnk
    FROM vcs WHERE vec_id < {N_QUERIES}) WHERE rnk <= {N_PROBE}
),
cand AS (
  SELECT DISTINCT p.query_id, a.vec_id AS nbr_id
  FROM probes p JOIN assign a ON a.centroid_id = p.centroid_id
  WHERE a.vec_id <> p.query_id
),
dots AS (
  SELECT cd.query_id, cd.nbr_id,
         sum(CAST(q.x AS DOUBLE) * CAST(c.x AS DOUBLE)) AS dot
  FROM cand cd
  JOIN comp q ON q.vec_id = cd.query_id
  JOIN comp c ON c.vec_id = cd.nbr_id AND c.dim = q.dim
  GROUP BY cd.query_id, cd.nbr_id
),
scored AS (
  SELECT d.query_id, d.nbr_id, d.dot / (nq.nrm * nc.nrm) AS cosine
  FROM dots d
  JOIN norms nq ON nq.vec_id = d.query_id
  JOIN norms nc ON nc.vec_id = d.nbr_id
),
ranked AS (
  SELECT query_id, nbr_id, cosine,
         row_number() OVER (PARTITION BY query_id
           ORDER BY round(cosine, 9) DESC, nbr_id ASC) AS rank
  FROM scored
)
SELECT query_id, nbr_id, CAST(rank AS BIGINT) AS rank,
       round(cosine, 6) AS cosine
FROM ranked WHERE rank <= {KNN_K}
"""


# ---- two-level IVF: coarse cells over the fine lists (round 14) ----

COARSE_STRIDE_MULT = 8   # coarse centers: every 8th fine centroid
P_COARSE = 2             # coarse cells probed per query


def q_ann_ivf_two_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level IVF top-k (VERDICT r13 #7): the billion-scale serving
    shape — a query scores the CONSTANT coarse table, probes its
    P_COARSE best cells, scores only the fine centroids inside them,
    probes N_PROBE lists, exact-reranks those lists' members. Fine
    centroids are the ann_ivf seed set (vec_id % 50 == 0 under the
    nlist cap); coarse centers are every COARSE_STRIDE_MULT-th of
    those — both deterministic, so the oracle mirrors the whole
    construction exactly. See operators.similarity.ivf_two_level_topk
    for the scale argument (|Q| x nlist -> |Q| x (coarse + cell))."""
    from data_timeseries_java_spark.operators.similarity import (
        ivf_two_level_topk)

    emb = load_table(spark, sf_dir, "embeddings")
    fine = emb.where((F.col("vec_id") % N_CENTROIDS_STRIDE == 0)
                     & (F.col("vec_id") < IVF_SEED_CAP))
    coarse = emb.where(
        (F.col("vec_id") % (N_CENTROIDS_STRIDE * COARSE_STRIDE_MULT)
         == 0) & (F.col("vec_id") < IVF_SEED_CAP))
    queries = emb.where(F.col("vec_id") < N_QUERIES).select("vec_id")
    return ivf_two_level_topk(emb, queries, fine, coarse, k=KNN_K,
                              n_probe=N_PROBE, p_coarse=P_COARSE,
                              use_kernel=True)


QUERIES["ann_ivf_two_level"] = q_ann_ivf_two_level

ORACLE["ann_ivf_two_level"] = f"""
WITH {_COMP},
cent AS (
  SELECT vec_id AS centroid_id, dim, x FROM comp
  WHERE vec_id % {N_CENTROIDS_STRIDE} = 0 AND vec_id < {IVF_SEED_CAP}
),
crs AS (
  SELECT vec_id AS coarse_id, dim, x FROM comp
  WHERE vec_id % {N_CENTROIDS_STRIDE * COARSE_STRIDE_MULT} = 0
    AND vec_id < {IVF_SEED_CAP}
),
cnorms AS (
  SELECT centroid_id, sqrt(sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS nrm
  FROM cent GROUP BY centroid_id
),
crnorms AS (
  SELECT coarse_id, sqrt(sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS nrm
  FROM crs GROUP BY coarse_id
),
cellmap AS (  -- fine centroid -> nearest coarse center
  SELECT centroid_id AS fine_id, coarse_id FROM (
    SELECT fc.centroid_id, fc.coarse_id,
           row_number() OVER (PARTITION BY fc.centroid_id
             ORDER BY round(fc.dot / (cn.nrm * rn.nrm), 9) DESC,
                      fc.coarse_id ASC) AS rnk
    FROM (SELECT f.centroid_id, r.coarse_id,
                 sum(CAST(f.x AS DOUBLE) * CAST(r.x AS DOUBLE)) AS dot
          FROM cent f JOIN crs r ON f.dim = r.dim
          GROUP BY f.centroid_id, r.coarse_id) fc
    JOIN cnorms cn ON cn.centroid_id = fc.centroid_id
    JOIN crnorms rn ON rn.coarse_id = fc.coarse_id)
  WHERE rnk = 1
),
vc AS (  -- cosine of every vector to every fine centroid
  SELECT v.vec_id, c.centroid_id,
         sum(CAST(v.x AS DOUBLE) * CAST(c.x AS DOUBLE)) AS dot
  FROM comp v JOIN cent c ON v.dim = c.dim
  GROUP BY v.vec_id, c.centroid_id
),
vcs AS (
  SELECT vc.vec_id, vc.centroid_id,
         vc.dot / (n.nrm * cn.nrm) AS cos
  FROM vc JOIN norms n ON n.vec_id = vc.vec_id
  JOIN cnorms cn ON cn.centroid_id = vc.centroid_id
),
assign AS (
  SELECT vec_id, centroid_id FROM (
    SELECT vec_id, centroid_id,
           row_number() OVER (PARTITION BY vec_id
             ORDER BY round(cos, 9) DESC, centroid_id ASC) AS rnk
    FROM vcs) WHERE rnk = 1
),
qcr AS (  -- query x coarse centers
  SELECT v.vec_id AS query_id, r.coarse_id,
         sum(CAST(v.x AS DOUBLE) * CAST(r.x AS DOUBLE)) AS dot
  FROM comp v JOIN crs r ON v.dim = r.dim
  WHERE v.vec_id < {N_QUERIES}
  GROUP BY v.vec_id, r.coarse_id
),
qcells AS (
  SELECT query_id, coarse_id FROM (
    SELECT q.query_id, q.coarse_id,
           row_number() OVER (PARTITION BY q.query_id
             ORDER BY round(q.dot / (n.nrm * rn.nrm), 9) DESC,
                      q.coarse_id ASC) AS rnk
    FROM qcr q
    JOIN norms n ON n.vec_id = q.query_id
    JOIN crnorms rn ON rn.coarse_id = q.coarse_id)
  WHERE rnk <= {P_COARSE}
),
probes AS (  -- fine lists inside the probed cells, best N_PROBE
  SELECT query_id, centroid_id FROM (
    SELECT s.vec_id AS query_id, s.centroid_id,
           row_number() OVER (PARTITION BY s.vec_id
             ORDER BY round(s.cos, 9) DESC, s.centroid_id ASC) AS rnk
    FROM vcs s
    JOIN cellmap cm ON cm.fine_id = s.centroid_id
    JOIN qcells qc ON qc.query_id = s.vec_id
                  AND qc.coarse_id = cm.coarse_id
    WHERE s.vec_id < {N_QUERIES})
  WHERE rnk <= {N_PROBE}
),
cand AS (
  SELECT DISTINCT p.query_id, a.vec_id AS nbr_id
  FROM probes p JOIN assign a ON a.centroid_id = p.centroid_id
  WHERE a.vec_id <> p.query_id
),
dots AS (
  SELECT cd.query_id, cd.nbr_id,
         sum(CAST(q.x AS DOUBLE) * CAST(c.x AS DOUBLE)) AS dot
  FROM cand cd
  JOIN comp q ON q.vec_id = cd.query_id
  JOIN comp c ON c.vec_id = cd.nbr_id AND c.dim = q.dim
  GROUP BY cd.query_id, cd.nbr_id
),
scored AS (
  SELECT d.query_id, d.nbr_id, d.dot / (nq.nrm * nc.nrm) AS cosine
  FROM dots d
  JOIN norms nq ON nq.vec_id = d.query_id
  JOIN norms nc ON nc.vec_id = d.nbr_id
),
ranked AS (
  SELECT query_id, nbr_id, cosine,
         row_number() OVER (PARTITION BY query_id
           ORDER BY round(cosine, 9) DESC, nbr_id ASC) AS rank
  FROM scored
)
SELECT query_id, nbr_id, CAST(rank AS BIGINT) AS rank,
       round(cosine, 6) AS cosine
FROM ranked WHERE rank <= {KNN_K}
"""


# ---- IVF with TRAINED centroids: Lloyd's k-means, fixed 3 iterations ----

KMEANS_ITERS = 3


def q_ann_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k over k-means-trained centroid lists. Training is
    Lloyd's with a fixed iteration count, expressed as one lazy
    DataFrame plan (operators/similarity.py:kmeans_centroids); the
    probing/rerank machinery is the same ivf_topk as the seed-set
    variant — only the centroid table changes."""
    from data_timeseries_java_spark.operators.similarity import (
        centroid_vectors,
        ivf_topk,
        kmeans_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cent = centroid_vectors(kmeans_centroids(
        emb, seed_stride=N_CENTROIDS_STRIDE, iterations=KMEANS_ITERS,
        seed_cap=IVF_SEED_CAP))
    queries = emb.where(F.col("vec_id") < N_QUERIES).select("vec_id")
    return ivf_topk(emb, queries, cent, k=KNN_K, n_probe=N_PROBE)


QUERIES["ann_ivf_trained"] = q_ann_ivf_trained


def _kmeans_cte(iterations: int, seed_cap: int | None = None) -> str:
    """Unrolled Lloyd's iterations as DuckDB CTEs, mirroring
    kmeans_centroids step for step (round(cos,9) ranked assignment,
    6-decimal-rounded mean update). ``seed_cap`` mirrors the operator's
    fixed-nlist seed cap (ann_ivf_trained); the SemDeDup companions
    deliberately train un-capped (k ∝ n, documented)."""
    cap = f" AND vec_id < {seed_cap}" if seed_cap is not None else ""
    sql = f"""
cent0 AS (
  SELECT vec_id AS centroid_id, dim, CAST(x AS DOUBLE) AS w
  FROM comp WHERE vec_id % {N_CENTROIDS_STRIDE} = 0{cap}
)"""
    for i in range(iterations):
        sql += f""",
cn{i} AS (
  SELECT centroid_id, sqrt(sum(w * w)) AS nrm FROM cent{i} GROUP BY centroid_id
),
vc{i} AS (
  SELECT v.vec_id, c.centroid_id, sum(CAST(v.x AS DOUBLE) * c.w) AS dot
  FROM comp v JOIN cent{i} c ON v.dim = c.dim
  GROUP BY v.vec_id, c.centroid_id
),
asg{i} AS (
  SELECT vec_id, centroid_id FROM (
    SELECT vc.vec_id, vc.centroid_id,
           row_number() OVER (PARTITION BY vc.vec_id
             ORDER BY round(vc.dot / (n.nrm * cn.nrm), 9) DESC,
                      vc.centroid_id ASC) AS rnk
    FROM vc{i} vc
    JOIN norms n ON n.vec_id = vc.vec_id
    JOIN cn{i} cn ON cn.centroid_id = vc.centroid_id)
  WHERE rnk = 1
),
cent{i + 1} AS (
  SELECT a.centroid_id, v.dim, round(avg(CAST(v.x AS DOUBLE)), 6) AS w
  FROM asg{i} a JOIN comp v ON v.vec_id = a.vec_id
  GROUP BY a.centroid_id, v.dim
)"""
    return sql


_N = KMEANS_ITERS
ORACLE["ann_ivf_trained"] = f"""
WITH {_COMP},
{_kmeans_cte(_N, seed_cap=IVF_SEED_CAP)},
cnorms AS (
  SELECT centroid_id, sqrt(sum(w * w)) AS nrm FROM cent{_N} GROUP BY centroid_id
),
vcs AS (
  SELECT v.vec_id, c.centroid_id,
         sum(CAST(v.x AS DOUBLE) * c.w) / (n.nrm * cn.nrm) AS cos
  FROM comp v
  JOIN cent{_N} c ON v.dim = c.dim
  JOIN norms n ON n.vec_id = v.vec_id
  JOIN cnorms cn ON cn.centroid_id = c.centroid_id
  GROUP BY v.vec_id, c.centroid_id, n.nrm, cn.nrm
),
assign AS (
  SELECT vec_id, centroid_id FROM (
    SELECT vec_id, centroid_id,
           row_number() OVER (PARTITION BY vec_id
             ORDER BY round(cos, 9) DESC, centroid_id ASC) AS rnk
    FROM vcs) WHERE rnk = 1
),
probes AS (
  SELECT vec_id AS query_id, centroid_id FROM (
    SELECT vec_id, centroid_id,
           row_number() OVER (PARTITION BY vec_id
             ORDER BY round(cos, 9) DESC, centroid_id ASC) AS rnk
    FROM vcs WHERE vec_id < {N_QUERIES}) WHERE rnk <= {N_PROBE}
),
cand AS (
  SELECT DISTINCT p.query_id, a.vec_id AS nbr_id
  FROM probes p JOIN assign a ON a.centroid_id = p.centroid_id
  WHERE a.vec_id <> p.query_id
),
dots AS (
  SELECT cd.query_id, cd.nbr_id,
         sum(CAST(q.x AS DOUBLE) * CAST(c.x AS DOUBLE)) AS dot
  FROM cand cd
  JOIN comp q ON q.vec_id = cd.query_id
  JOIN comp c ON c.vec_id = cd.nbr_id AND c.dim = q.dim
  GROUP BY cd.query_id, cd.nbr_id
),
scored AS (
  SELECT d.query_id, d.nbr_id, d.dot / (nq.nrm * nc.nrm) AS cosine
  FROM dots d
  JOIN norms nq ON nq.vec_id = d.query_id
  JOIN norms nc ON nc.vec_id = d.nbr_id
),
ranked AS (
  SELECT query_id, nbr_id, cosine,
         row_number() OVER (PARTITION BY query_id
           ORDER BY round(cosine, 9) DESC, nbr_id ASC) AS rank
  FROM scored
)
SELECT query_id, nbr_id, CAST(rank AS BIGINT) AS rank,
       round(cosine, 6) AS cosine
FROM ranked WHERE rank <= {KNN_K}
"""


# ---- embedding int8 quantization (storage/serving prep) -----------------


def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization per vector: scale = max|x|/127,
    q_i = round(x_i/scale). All JVM-side higher-order functions; output
    scalars (scale + quantized sums) so the check stays engine-portable
    (array columns hash differently across engines).

    round() on the half-integer grid is engine-divergent (Java HALF_UP
    vs C round-half-away vs banker's) — floor(x + 0.5) pins identical
    half-up semantics in both engines (negative halves round UP toward
    zero+: floor(-2.5 + 0.5) = -2, same both sides)."""
    emb = load_table(spark, sf_dir, "embeddings")
    x = F.col("embedding")
    absmax = F.aggregate(
        x, F.lit(0.0),
        lambda acc, v: F.greatest(acc, F.abs(v.cast("double"))))
    scale = absmax / F.lit(127.0)
    q = F.transform(
        x, lambda v: F.floor(v.cast("double") / scale + 0.5).cast("long"))
    return (emb.where(absmax > 0).select(
        "vec_id",
        F.round(scale, 9).alias("scale"),
        F.aggregate(q, F.lit(0).cast("long"),
                    lambda acc, v: acc + v).alias("q_sum"),
        F.aggregate(q, F.lit(0).cast("long"),
                    lambda acc, v: acc + v * v).alias("q_l2")))


QUERIES["embedding_quantize"] = q_embedding_quantize

ORACLE["embedding_quantize"] = """
WITH comp AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings
),
scales AS (
  SELECT vec_id, max(abs(x)) / 127.0 AS scale FROM comp GROUP BY vec_id
)
SELECT c.vec_id, round(s.scale, 9) AS scale,
       CAST(sum(floor(c.x / s.scale + 0.5)) AS BIGINT) AS q_sum,
       CAST(sum(floor(c.x / s.scale + 0.5) * floor(c.x / s.scale + 0.5))
            AS BIGINT) AS q_l2
FROM comp c JOIN scales s ON c.vec_id = s.vec_id
WHERE s.scale > 0
GROUP BY c.vec_id, s.scale
"""


# ---- per-label embedding diagnostics -----------------------------------


def q_embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label count / dim / mean norm / centroid norm — see
    operators.similarity.embedding_stats."""
    from data_timeseries_java_spark.operators.similarity import (
        embedding_stats)

    return embedding_stats(load_table(spark, sf_dir, "embeddings"))


QUERIES["embedding_stats"] = q_embedding_stats

ORACLE["embedding_stats"] = f"""
WITH {_COMP},
per_dim AS (
  SELECT c.label, c.dim,
         sum(CAST(c.x AS DOUBLE)) AS s,
         count(*) AS n,
         avg(CASE WHEN c.dim = 0 THEN n2.nrm END) AS nrm0
  FROM comp c JOIN norms n2 USING (vec_id)
  GROUP BY c.label, c.dim
)
SELECT label,
       CAST(max(n) AS BIGINT) AS n_vecs,
       CAST(count(*) AS BIGINT) AS dim,
       round(max(nrm0), 6) AS avg_norm,
       round(sqrt(sum((s / n) * (s / n))), 6) AS centroid_norm
FROM per_dim
GROUP BY label
"""


# ---- signed random projection sketch (int-exact, fully hash-checked) ----

SRP_PLANES = 16
SRP_DIM = 64        # the embeddings fixture's dimension (TESTDATA.md)


def _srp_signs() -> list[list[int]]:
    """Deterministic ±1 projection matrix shared VERBATIM by the Spark
    plan and the DuckDB oracle: sign[j][i] = +1 iff the first hex char
    of md5("j:i") has its top bit set (same md5-lane convention as the
    MinHash/CMS tiers). Python-precomputed so both engines consume
    identical literals — no hash-function parity to trust."""
    import hashlib

    return [[1 if hashlib.md5(f"{j}:{i}".encode()).hexdigest()[0]
             in "89abcdef" else -1
             for i in range(SRP_DIM)]
            for j in range(SRP_PLANES)]


def q_embedding_srp_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signed-random-projection sketch over int8-QUANTIZED embeddings:
    quantization (the engine's existing floor-half-up contract) makes
    every projection an exact INTEGER dot product, so the 16-bit sign
    fingerprint, the projection sum and the L1 mass are all
    order-insensitive and bit-identical across engines — the
    cosine-sketch analogue of the CMS tier's fully-hash-checked-sketch
    pattern (proj sign agreement estimates cosine angle; Charikar's
    SimHash for dense vectors). All JVM higher-order functions."""
    emb = load_table(spark, sf_dir, "embeddings")
    x = F.col("embedding")
    absmax = F.aggregate(
        x, F.lit(0.0),
        lambda acc, v: F.greatest(acc, F.abs(v.cast("double"))))
    scale = absmax / F.lit(127.0)
    q = F.transform(
        x, lambda v: F.floor(v.cast("double") / scale + 0.5).cast("long"))
    base = emb.where(absmax > 0).select("vec_id", q.alias("qv"))
    signs = _srp_signs()
    projs = [
        F.aggregate(
            F.zip_with(F.col("qv"),
                       F.array(*[F.lit(s) for s in signs[j]]),
                       lambda a, b: a * b),
            F.lit(0).cast("long"), lambda acc, v: acc + v).alias(f"p{j}")
        for j in range(SRP_PLANES)]
    p = base.select("vec_id", *projs)
    bits = F.concat(*[F.when(F.col(f"p{j}") >= 0, F.lit("1"))
                      .otherwise(F.lit("0"))
                      for j in range(SRP_PLANES)])
    total = sum((F.col(f"p{j}") for j in range(SRP_PLANES)), F.lit(0))
    l1 = sum((F.abs(F.col(f"p{j}")) for j in range(SRP_PLANES)), F.lit(0))
    return p.select("vec_id", bits.alias("srp_bits"),
                    total.cast("long").alias("proj_sum"),
                    l1.cast("long").alias("proj_l1"))


QUERIES["embedding_srp_sketch"] = q_embedding_srp_sketch


def _srp_sql() -> str:
    signs = _srp_signs()
    proj_exprs = ",\n       ".join(
        "(" + " + ".join(f"({s} * qv[{i + 1}])"
                         for i, s in enumerate(signs[j])) + f") AS p{j}"
        for j in range(SRP_PLANES))
    bit_concat = " || ".join(
        f"CASE WHEN p{j} >= 0 THEN '1' ELSE '0' END"
        for j in range(SRP_PLANES))
    p_sum = " + ".join(f"p{j}" for j in range(SRP_PLANES))
    p_l1 = " + ".join(f"abs(p{j})" for j in range(SRP_PLANES))
    return f"""
WITH sc AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS xe,
         list_max(list_transform(embedding,
                                 x -> abs(CAST(x AS DOUBLE)))) / 127.0
           AS scale
  FROM embeddings
),
q AS (
  SELECT vec_id,
         list_transform(xe, x -> CAST(floor(x / scale + 0.5) AS BIGINT))
           AS qv
  FROM sc WHERE scale > 0
),
p AS (
  SELECT vec_id,
       {proj_exprs}
  FROM q
)
SELECT vec_id,
       {bit_concat} AS srp_bits,
       CAST({p_sum} AS BIGINT) AS proj_sum,
       CAST({p_l1} AS BIGINT) AS proj_l1
FROM p
"""


ORACLE["embedding_srp_sketch"] = _srp_sql()


def q_embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label covariance matrix of the embedding dimensions (upper
    triangle) — per-partition BLAS Gram accumulation, one tiny reduce,
    never a (vector x dim x dim) explode (operators/similarity.
    embedding_covariance; the oracle pays the explode blowup instead,
    which is what makes the hash match meaningful)."""
    from data_timeseries_java_spark.operators.similarity import (
        embedding_covariance,
    )

    return embedding_covariance(load_table(spark, sf_dir, "embeddings"))


QUERIES["embedding_covariance"] = q_embedding_covariance

ORACLE["embedding_covariance"] = f"""
WITH {_COMP},
cross_sums AS (
  SELECT a.label, a.dim AS i, b.dim AS j,
         round(sum(CAST(a.x AS DOUBLE) * CAST(b.x AS DOUBLE)), 6) AS sxx
  FROM comp a JOIN comp b ON a.vec_id = b.vec_id AND a.dim <= b.dim
  GROUP BY a.label, a.dim, b.dim
),
dim_sums AS (
  SELECT label, dim, round(sum(CAST(x AS DOUBLE)), 6) AS s
  FROM comp GROUP BY label, dim
),
cnt AS (
  SELECT label, round(CAST(count(*) AS DOUBLE), 6) AS n
  FROM embeddings GROUP BY label
)
SELECT c.label, c.i, c.j,
       CAST(t.n AS BIGINT) AS n_vectors,
       round(c.sxx / t.n - (si.s / t.n) * (sj.s / t.n), 6) + 0.0 AS cov
FROM cross_sums c
JOIN cnt t ON t.label = c.label
JOIN dim_sums si ON si.label = c.label AND si.dim = c.i
JOIN dim_sums sj ON sj.label = c.label AND sj.dim = c.j
"""


# ---- SemDeDup-style semantic dedup ---------------------------------------

SEMDEDUP_T = 0.3  # same corpus-calibrated threshold as NEARDUP_T


def q_semantic_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXPLICIT exact variant of SemDeDup: corpus-trained k-means
    (k ~ n via the seed stride — O(n*k*d) per Lloyd iteration, the
    measured 38x-per-decade term in SCALE.md) plus exact brute-force
    nearest-centroid assignment. Kept under an explicit ``_exact``
    name as the accuracy companion; the unsuffixed ``semantic_dedup``
    flagship is the scale-safe derived-k (k ~ n/derived_tcs(n))
    sample-trained + SRP-banded path so a user reaching for the
    default never lands on the quadratic trainer. Within-cluster cosine >= threshold against a lower-id
    mate drops a vector — see operators.similarity.semantic_dedup.
    Same trained centroids as ann_ivf_trained; pair space is
    Σ cluster², never all-pairs."""
    from data_timeseries_java_spark.operators.similarity import (
        centroid_vectors,
        kmeans_centroids,
        semantic_dedup,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cent = centroid_vectors(kmeans_centroids(
        emb, seed_stride=N_CENTROIDS_STRIDE, iterations=KMEANS_ITERS))
    return semantic_dedup(emb, cent, threshold=SEMDEDUP_T)


QUERIES["semantic_dedup_exact"] = q_semantic_dedup_exact

_SD_N = KMEANS_ITERS
ORACLE["semantic_dedup_exact"] = f"""
WITH {_COMP},
{_kmeans_cte(_SD_N)},
cnorms AS (
  SELECT centroid_id, sqrt(sum(w * w)) AS nrm
  FROM cent{_SD_N} GROUP BY centroid_id
),
vcs AS (
  SELECT v.vec_id, c.centroid_id,
         sum(CAST(v.x AS DOUBLE) * c.w) / (n.nrm * cn.nrm) AS cos
  FROM comp v
  JOIN cent{_SD_N} c ON v.dim = c.dim
  JOIN norms n ON n.vec_id = v.vec_id
  JOIN cnorms cn ON cn.centroid_id = c.centroid_id
  GROUP BY v.vec_id, c.centroid_id, n.nrm, cn.nrm
),
assign AS (
  SELECT vec_id, centroid_id FROM (
    SELECT vec_id, centroid_id,
           row_number() OVER (PARTITION BY vec_id
             ORDER BY round(cos, 9) DESC, centroid_id ASC) AS rnk
    FROM vcs) WHERE rnk = 1
),
pair_dots AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b, aa.centroid_id,
         sum(CAST(a.x AS DOUBLE) * CAST(b.x AS DOUBLE)) AS dot
  FROM assign aa
  JOIN assign ab ON ab.centroid_id = aa.centroid_id
                AND aa.vec_id < ab.vec_id
  JOIN comp a ON a.vec_id = aa.vec_id
  JOIN comp b ON b.vec_id = ab.vec_id AND b.dim = a.dim
  GROUP BY a.vec_id, b.vec_id, aa.centroid_id
),
dup AS (
  SELECT id_b AS vec_id, min(id_a) AS dup_of,
         max(round(dot / (na.nrm * nb.nrm), 9)) AS mx
  FROM pair_dots p
  JOIN norms na ON na.vec_id = p.id_a
  JOIN norms nb ON nb.vec_id = p.id_b
  WHERE round(dot / (na.nrm * nb.nrm), 9) >= {SEMDEDUP_T}
  GROUP BY id_b
)
SELECT a.vec_id, a.centroid_id,
       d.dup_of IS NULL AS is_kept,
       d.dup_of,
       round(d.mx, 6) AS max_dup_cos
FROM assign a LEFT JOIN dup d ON d.vec_id = a.vec_id
"""


# ---- SemDeDup with SRP-banded (linear-time) centroid assignment ----------

SRP_BAND_BITS = 4  # 16 planes -> 4 bands of 4 bits; candidates/vector
#   ~ n_bands * k / 2**band_bits — band_bits should track log2(k) (at
#   k=40 this traces every mechanism while keeping assignment dense on
#   the synthetic near-orthogonal fixture; production k would use wider
#   bands over more planes)


def q_semantic_dedup_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup with LSH-banded centroid assignment — the 100-TB shape
    where the centroid count grows with the corpus and exact
    nearest-centroid scan (O(n*k*d)) is the quadratic term. Same
    trained centroids, same within-cluster verdict stage; assignment
    goes through the int-exact SRP signature's band buckets (see
    operators.similarity.srp_assign). Unassigned vectors land in
    cluster -1, kept."""
    from data_timeseries_java_spark.operators.similarity import (
        centroid_vectors,
        kmeans_centroids,
        semantic_dedup_ann,
    )

    from data_timeseries_java_spark.plans.materialize import materialize

    emb = load_table(spark, sf_dir, "embeddings")
    # the trained centroid table feeds THREE consumers (band side, exact
    # rerank side, verdict base) and embeds the unrolled k-means tree —
    # materialize the k x d vectors once
    cent = materialize(centroid_vectors(kmeans_centroids(
        emb, seed_stride=N_CENTROIDS_STRIDE, iterations=KMEANS_ITERS)))
    return semantic_dedup_ann(emb, cent, _srp_signs(),
                              threshold=SEMDEDUP_T,
                              band_bits=SRP_BAND_BITS)


QUERIES["semantic_dedup_ann"] = q_semantic_dedup_ann


def _srp_proj_sql(qv: str = "qv") -> str:
    """Projection expressions p0..p{P-1} over a 1-indexed BIGINT list
    column — shared verbatim with q_embedding_srp_sketch's oracle."""
    signs = _srp_signs()
    return ",\n       ".join(
        "(" + " + ".join(f"({s} * {qv}[{i + 1}])"
                         for i, s in enumerate(signs[j])) + f") AS p{j}"
        for j in range(SRP_PLANES))


def _srp_band_sql(src: str, id_expr: str) -> str:
    """UNION-ALL band-key rows (id, band_idx, band_key) from a CTE
    holding p0..p{P-1} sign projections."""
    n_bands = SRP_PLANES // SRP_BAND_BITS
    parts = []
    for b in range(n_bands):
        key = " + ".join(
            f"(CASE WHEN p{b * SRP_BAND_BITS + t} >= 0 "
            f"THEN {1 << t} ELSE 0 END)"
            for t in range(SRP_BAND_BITS))
        parts.append(
            f"SELECT {id_expr}, {b} AS band_idx, "
            f"CAST({key} AS BIGINT) AS band_key FROM {src}")
    return "\n  UNION ALL\n  ".join(parts)


def _semdedup_ann_tail(cent_cte: str) -> str:
    """The SRP-banded-assignment + within-cluster-verdict CTE chain of
    the SemDeDup-ANN oracle, parameterized on the trained-centroid CTE
    name — shared verbatim by semantic_dedup_ann (corpus-trained
    centroids) and semantic_dedup_fixedk (fixed-k sample-trained)."""
    return f"""cnormf AS (
  SELECT centroid_id, sqrt(sum(w * w)) AS nrm
  FROM {cent_cte} GROUP BY centroid_id
),
cvec AS (
  SELECT centroid_id, list(w ORDER BY dim) AS cv
  FROM {cent_cte} GROUP BY centroid_id
),
vsc AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS xe,
         list_max(list_transform(embedding,
                                 x -> abs(CAST(x AS DOUBLE)))) / 127.0
           AS scale
  FROM embeddings
),
vqv AS (
  SELECT vec_id,
         list_transform(xe, x -> CAST(floor(x / scale + 0.5) AS BIGINT))
           AS qv
  FROM vsc WHERE scale > 0
),
vp AS (
  SELECT vec_id,
       {_srp_proj_sql()}
  FROM vqv
),
csc AS (
  SELECT centroid_id, cv AS xe,
         list_max(list_transform(cv, x -> abs(x))) / 127.0 AS scale
  FROM cvec
),
cqv AS (
  SELECT centroid_id,
         list_transform(xe, x -> CAST(floor(x / scale + 0.5) AS BIGINT))
           AS qv
  FROM csc WHERE scale > 0
),
cp AS (
  SELECT centroid_id,
       {_srp_proj_sql()}
  FROM cqv
),
vb AS (
  {_srp_band_sql("vp", "vec_id")}
),
cb AS (
  {_srp_band_sql("cp", "centroid_id")}
),
cand AS (
  SELECT DISTINCT v.vec_id, c.centroid_id
  FROM vb v JOIN cb c
    ON v.band_idx = c.band_idx AND v.band_key = c.band_key
),
cdot AS (
  SELECT ca.vec_id, ca.centroid_id, sum(CAST(v.x AS DOUBLE) * cc.w) AS dot
  FROM cand ca
  JOIN comp v ON v.vec_id = ca.vec_id
  JOIN {cent_cte} cc ON cc.centroid_id = ca.centroid_id
                    AND cc.dim = v.dim
  GROUP BY ca.vec_id, ca.centroid_id
),
assign AS (
  SELECT vec_id, centroid_id FROM (
    SELECT d.vec_id, d.centroid_id,
           row_number() OVER (PARTITION BY d.vec_id
             ORDER BY round(d.dot / (n.nrm * cn.nrm), 9) DESC,
                      d.centroid_id ASC) AS rnk
    FROM cdot d
    JOIN norms n ON n.vec_id = d.vec_id
    JOIN cnormf cn ON cn.centroid_id = d.centroid_id)
  WHERE rnk = 1
),
pair_dots AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b, aa.centroid_id,
         sum(CAST(a.x AS DOUBLE) * CAST(b.x AS DOUBLE)) AS dot
  FROM assign aa
  JOIN assign ab ON ab.centroid_id = aa.centroid_id
                AND aa.vec_id < ab.vec_id
  JOIN comp a ON a.vec_id = aa.vec_id
  JOIN comp b ON b.vec_id = ab.vec_id AND b.dim = a.dim
  GROUP BY a.vec_id, b.vec_id, aa.centroid_id
),
dup AS (
  SELECT id_b AS vec_id, min(id_a) AS dup_of,
         max(round(dot / (na.nrm * nb.nrm), 9)) AS mx
  FROM pair_dots p
  JOIN norms na ON na.vec_id = p.id_a
  JOIN norms nb ON nb.vec_id = p.id_b
  WHERE round(dot / (na.nrm * nb.nrm), 9) >= {SEMDEDUP_T}
  GROUP BY id_b
)
SELECT a.vec_id, a.centroid_id,
       d.dup_of IS NULL AS is_kept,
       d.dup_of,
       round(d.mx, 6) AS max_dup_cos
FROM assign a LEFT JOIN dup d ON d.vec_id = a.vec_id
UNION ALL
SELECT e.vec_id, CAST(-1 AS BIGINT) AS centroid_id,
       TRUE AS is_kept, CAST(NULL AS BIGINT) AS dup_of,
       CAST(NULL AS DOUBLE) AS max_dup_cos
FROM embeddings e
WHERE e.vec_id NOT IN (SELECT vec_id FROM assign)
"""


ORACLE["semantic_dedup_ann"] = f"""
WITH {_COMP},
{_kmeans_cte(_SD_N)},
{_semdedup_ann_tail(f"cent{_SD_N}")}
"""


# ---- SemDeDup, fully linear: fixed-k sample-trained + SRP assignment ------

FIXEDK_K = 10       # fixed centroid count — does NOT grow with the corpus
FIXEDK_SAMPLE = 250  # bounded training sample — constant as n grows

# The UNSUFFIXED flagship's size-derived grid (round-12, target
# cluster size DERIVED round-13 — closes VERDICT r12 #2):
#   tcs = derived_tcs(n)              — the verify/train balance point
#     with the two sides priced at their ACTUAL throughputs. Lloyd's
#     on the S = 25·k sample costs ~25·k²·d = 25·n²·d/tcs² FLOPs on
#     the DRIVER (the SemDeDup paper's single-node training posture);
#     the within-cluster verify costs ~n·tcs·d FLOPs spread across the
#     CLUSTER. Equating wall-clocks — train/1 = verify/C with
#     C = TRAIN_PARALLELISM_RATIO executor slots per driver — gives
#     tcs³ = 25·C·n. The first, naive cut of this round used C = 1
#     (tcs = (25n)^{1/3}): measured 47 s at the 100x decade vs round
#     12's 9.9 s, all of it driver-side Lloyd's on an over-sized
#     k = 1562 — the model was balancing a 32-way-parallel stage
#     against a 1-way stage at par. With C = 32, tcs(200k) snaps to
#     512 and k returns to ~390 — the k ≈ 400 that round 12 MEASURED
#     as optimal, now derived instead of pinned.
#   k = max(FIXEDK_K, n // tcs)       — mean cluster size ~tcs, so the
#     verdict space Σ cluster² ≈ n·(25Cn)^{1/3} — sub-quadratic — and
#     the training sample S = 25·k ≈ 25·n^{2/3}/(25C)^{1/3} — SUBLINEAR
#     (the r12 constant TCS=500 left S growing as n/20).
#   S = SAMPLE_PER_K * k — training sample ∝ k (the SemDeDup paper's
#     own posture).
# The grid snap uses pure INTEGER comparisons (n >= ceil(8^j / 800) ⟺
# (800n)^{1/3} >= 2^j), so the Spark-side Python and the DuckDB CASE
# can never disagree at a boundary n the way float pow/log could.
# TRAIN_PARALLELISM_RATIO is a pinned engine constant — the oracle
# must derive the same integer, so it cannot read the live
# sc.defaultParallelism; 32 is this box's slot count, and a larger
# cluster raises it (documented knob, SCALE.md round-13). Floor 2^4
# keeps clusters non-degenerate at tiny corpora; the 2^20 cap is past
# any real deployment (800n < 8^21 ⟺ n < 1.2e16). First grid switch
# (64 -> 128) above the smallest SF at n >= ceil(8^7/800) = 2,622 —
# low enough that the replicated-corpus parity test crosses it with a
# k the DuckDB oracle's unrolled Lloyd's CTEs chew in seconds
# (n=3000 -> tcs=128, k=23), unlike a 500-base grid whose first
# switch sits at n = 40M.
TCS_MIN_LOG2 = 4
TCS_MAX_LOG2 = 20
SAMPLE_PER_K = 25
TRAIN_PARALLELISM_RATIO = 32


def _tcs_threshold(j: int) -> int:
    # n >= ceil(8^j / (25·C))  ⟺  25·C·n >= 8^j — comparing n against
    # a precomputed integer keeps the SQL side free of an INT64
    # overflow on 800*n (8^20 itself fits comfortably in int64)
    c = SAMPLE_PER_K * TRAIN_PARALLELISM_RATIO
    return (8 ** j + c - 1) // c


def derived_tcs(n: int) -> int:
    """Target cluster size for the derived-k flagship:
    (25·C·n)^{1/3} with C = TRAIN_PARALLELISM_RATIO, snapped down to
    {2^j : TCS_MIN_LOG2 <= j <= TCS_MAX_LOG2} via integer
    comparisons — mirrored exactly in SQL by _tcs_case_sql."""
    j = TCS_MIN_LOG2
    while j < TCS_MAX_LOG2 and n >= _tcs_threshold(j + 1):
        j += 1
    return 2 ** j


def _tcs_case_sql(n_expr: str) -> str:
    """The same grid snap as derived_tcs, as a DuckDB CASE over the
    same integer-literal thresholds (no float pow/log, no 800*n
    multiply that could overflow int64)."""
    branches = "".join(
        f"\n    WHEN ({n_expr}) >= {_tcs_threshold(j)} THEN {2 ** j}"
        for j in range(TCS_MAX_LOG2, TCS_MIN_LOG2, -1))
    return f"CASE{branches}\n    ELSE {2 ** TCS_MIN_LOG2} END"


def _fixedk_iter_blocks(iterations: int) -> str:
    """The unrolled Lloyd's iteration CTEs shared by the pinned-k and
    derived-k oracle builders (identical in both; only the fsamp /
    fseeds head differs). Final centroid CTE is fcent{iterations}."""
    sql = ""
    for i in range(iterations):
        sql += f""",
fcn{i} AS (
  SELECT centroid_id, sqrt(sum(w * w)) AS nrm
  FROM fcent{i} GROUP BY centroid_id
),
fvc{i} AS (
  SELECT v.vec_id, c.centroid_id, sum(v.x * c.w) AS dot
  FROM fcomp v JOIN fcent{i} c ON v.dim = c.dim
  GROUP BY v.vec_id, c.centroid_id
),
fasg{i} AS (
  SELECT vec_id, centroid_id FROM (
    SELECT vc.vec_id, vc.centroid_id,
           row_number() OVER (PARTITION BY vc.vec_id
             ORDER BY round(vc.dot / (n.nrm * cn.nrm), 9) DESC,
                      vc.centroid_id ASC) AS rnk
    FROM fvc{i} vc
    JOIN norms n ON n.vec_id = vc.vec_id
    JOIN fcn{i} cn ON cn.centroid_id = vc.centroid_id)
  WHERE rnk = 1
),
fcent{i + 1} AS (
  SELECT a.centroid_id, v.dim, round(avg(v.x), 6) AS w
  FROM fasg{i} a JOIN fcomp v ON v.vec_id = a.vec_id
  GROUP BY a.centroid_id, v.dim
)"""
    return sql


def _kmeans_fixedk_cte(iterations: int, k: int, sample_size: int) -> str:
    """Unrolled fixed-k Lloyd's over a bounded scrambled-id sample,
    mirroring operators.similarity.kmeans_centroids_fixedk step for
    step (Knuth-scramble top-S sample, first-k seeds, round(cos,9)
    ranked assignment, 6-decimal mean update). Final centroid CTE is
    fcent{{iterations}}."""
    from data_timeseries_java_spark.operators.similarity import (
        SCRAMBLE_MULT,
        SCRAMBLE_PRIME,
    )

    sql = f"""
fscr AS (
  SELECT vec_id,
         ((vec_id % {SCRAMBLE_PRIME}) * {SCRAMBLE_MULT})
           % {SCRAMBLE_PRIME} AS s
  FROM embeddings
),
fsamp AS (SELECT vec_id FROM fscr ORDER BY s, vec_id LIMIT {sample_size}),
fcomp AS (
  SELECT c.vec_id, c.dim, CAST(c.x AS DOUBLE) AS x
  FROM comp c JOIN fsamp fs ON fs.vec_id = c.vec_id
),
fseeds AS (SELECT vec_id FROM fscr ORDER BY s, vec_id LIMIT {k}),
fcent0 AS (
  SELECT c.vec_id AS centroid_id, c.dim, c.x AS w
  FROM fcomp c JOIN fseeds s ON s.vec_id = c.vec_id
)"""
    return sql + _fixedk_iter_blocks(iterations)


def _kmeans_autok_cte(iterations: int) -> str:
    """Derived-k Lloyd's for the UNSUFFIXED flagship: k is computed IN
    SQL from count(*) — k = greatest(FIXEDK_K, n // derived_tcs(n))
    with derived_tcs expanded to the integer-literal CASE of
    _tcs_case_sql, S = SAMPLE_PER_K * k — mirroring q_semantic_dedup's
    count()-derived integers, so this oracle is valid at ANY scale
    factor, not just where the grid floors at FIXEDK_K (and not just
    below the first tcs grid switch). Sample/seed selection is the
    same Knuth-scramble ordering as the pinned-k builder, expressed as
    a rank filter against the scalar k instead of a literal LIMIT.
    Final centroid CTE is fcent{iterations}."""
    from data_timeseries_java_spark.operators.similarity import (
        SCRAMBLE_MULT,
        SCRAMBLE_PRIME,
    )

    sql = f"""
fn AS (SELECT count(*) AS n FROM embeddings),
fk AS (
  SELECT greatest({FIXEDK_K},
                  CAST(n // ({_tcs_case_sql("n")}) AS BIGINT)) AS k
  FROM fn
),
fscr AS (
  SELECT vec_id,
         ((vec_id % {SCRAMBLE_PRIME}) * {SCRAMBLE_MULT})
           % {SCRAMBLE_PRIME} AS s
  FROM embeddings
),
frnk AS (
  SELECT vec_id, row_number() OVER (ORDER BY s, vec_id) AS r
  FROM fscr
),
fsamp AS (
  SELECT vec_id FROM frnk, fk WHERE r <= fk.k * {SAMPLE_PER_K}
),
fcomp AS (
  SELECT c.vec_id, c.dim, CAST(c.x AS DOUBLE) AS x
  FROM comp c JOIN fsamp fs ON fs.vec_id = c.vec_id
),
fseeds AS (SELECT vec_id FROM frnk, fk WHERE r <= fk.k),
fcent0 AS (
  SELECT c.vec_id AS centroid_id, c.dim, c.x AS w
  FROM fcomp c JOIN fseeds s ON s.vec_id = c.vec_id
)"""
    return sql + _fixedk_iter_blocks(iterations)


def q_semantic_dedup_fixedk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup with a PINNED k: training is fixed-k Lloyd's on a
    bounded deterministic sample
    (operators.similarity.kmeans_centroids_fixedk — constant cost, no
    k ~ n trainer term) and assignment stays SRP-banded (srp_assign,
    linear). Honest caveat — and why this is NOT the unsuffixed
    flagship (round-11 VERDICT): with k pinned, cluster size grows
    with the corpus and the within-cluster verdict join is
    Σ cluster² = n²/k — the 100x audit killed this lane's verify stage
    after 17 minutes. The flagship ``semantic_dedup`` instead derives
    k ~ n/derived_tcs(n) (verdict space ≈ n·(25n)^{1/3},
    sub-quadratic) and trains on an S ∝ k sample; this pinned-k lane stays
    declared as the constant-cost small-corpus variant. Same verdict
    contract as semantic_dedup_ann."""
    from data_timeseries_java_spark.operators.similarity import (
        centroid_vectors,
        kmeans_centroids_fixedk,
        semantic_dedup_ann,
    )

    from data_timeseries_java_spark.plans.materialize import materialize

    emb = load_table(spark, sf_dir, "embeddings")
    cent = materialize(centroid_vectors(kmeans_centroids_fixedk(
        emb, k=FIXEDK_K, sample_size=FIXEDK_SAMPLE,
        iterations=KMEANS_ITERS)))
    return semantic_dedup_ann(emb, cent, _srp_signs(),
                              threshold=SEMDEDUP_T,
                              band_bits=SRP_BAND_BITS)


QUERIES["semantic_dedup_fixedk"] = q_semantic_dedup_fixedk

ORACLE["semantic_dedup_fixedk"] = f"""
WITH {_COMP},
{_kmeans_fixedk_cte(KMEANS_ITERS, FIXEDK_K, FIXEDK_SAMPLE)},
{_semdedup_ann_tail(f"fcent{KMEANS_ITERS}")}
"""


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The UNSUFFIXED SemDeDup flagship — scale-safe by construction
    (round-12; closes the round-11 VERDICT's one remaining
    scale-killer; round-13 derives the cluster-size target too,
    closing VERDICT r12 #2). Both integers are DERIVED from corpus
    size on deterministic grids, from one cheap parquet count:
    tcs = derived_tcs(n) — the verify/train balance point (25n)^{1/3}
    snapped to a power-of-two grid by integer comparisons — and
    k = max(FIXEDK_K, n // tcs). Mean cluster size is bounded by ~tcs,
    so the within-cluster verdict space is Σ cluster² ≈ n·(25n)^{1/3}
    (sub-quadratic) and the training sample S = SAMPLE_PER_K·k ≈
    (25n)^{2/3} is SUBLINEAR — the r12 constant TCS=500 left S
    growing as n/20 (driver-side numpy) and the masked-dense
    assignment term as n²·d/500; with the derived tcs both track the
    balance point instead. The pinned-k lane stays available, honestly
    suffixed, as ``semantic_dedup_fixedk``. Training is fixed-k
    Lloyd's over the S scrambled-id sample (kmeans_centroids_fixedk —
    S ∝ k per the SemDeDup paper's own recipe); assignment is
    SRP-banded (linear). The oracle derives BOTH integers the SAME way
    in SQL (a count(*) scalar through _tcs_case_sql's integer-literal
    CASE, and a rank filter), so it is valid at any SF — verified
    ACROSS the first tcs grid switch (n=10,486) by the
    replicated-corpus parity test (tests/test_similarity.py). The
    plan SHAPE is static — the same trainer and assignment at every
    size; only the (tcs, k, S) integers move with n, in lockstep on
    both engines. Exact corpus-trained variant:
    ``semantic_dedup_exact``; k~n-trained SRP hybrid:
    ``semantic_dedup_ann``.

    Execution goes through the KERNELIZED path
    (operators.similarity.semantic_dedup_autok): numpy Lloyd's over
    the bounded sample, broadcast-centroid banded assignment in one
    mapInPandas scan, per-cluster chunked-Gram verdicts — measured
    59 s + 98 s of the declarative path's training/assignment joins
    collapsed to BLAS at the 100x decade. Its output is IDENTICAL to
    the declarative fixed-k + SRP composition (pinned at two sizes by
    tests/test_similarity.py), so the one DuckDB oracle covers it —
    the pairwise_correlations_auto precedent."""
    from data_timeseries_java_spark.operators.similarity import (
        semantic_dedup_autok,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    # One count at plan-build picks the grid point; parquet count is
    # metadata-cheap (row-group stats, no column IO) and is the
    # alternative to a single-partition global rank, which would NOT
    # survive scale.
    n = emb.count()
    k = max(FIXEDK_K, n // derived_tcs(n))
    # n_hint: the count above, reused so the verdict stage's partition
    # pin is size-aware (wide only past VERDICT_PIN_MIN_ROWS — r15)
    return semantic_dedup_autok(emb, k=k, signs=_srp_signs(),
                                sample_size=SAMPLE_PER_K * k,
                                iterations=KMEANS_ITERS,
                                threshold=SEMDEDUP_T,
                                band_bits=SRP_BAND_BITS,
                                n_hint=n)


QUERIES["semantic_dedup"] = q_semantic_dedup
ORACLE["semantic_dedup"] = f"""
WITH {_COMP},
{_kmeans_autok_cte(KMEANS_ITERS)},
{_semdedup_ann_tail(f"fcent{KMEANS_ITERS}")}
"""


# ---- streaming SemDeDup, driver-gated through replay ----------------------

_SEMDEDUP_REPLAY_SINKS: dict[tuple, str] = {}


def q_semantic_dedup_stream_replay(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """The SemDeDup pipeline executed through the STREAMING gate
    (round-13 — the last dedup family member without one):
    `embeddings` replayed as 3 vec-id-range files through
    streaming/semdedup_stream.py — offline-trained centroids with the
    FLAGSHIP's derived integers (tcs = derived_tcs(n),
    k = max(FIXEDK_K, n // tcs), S = SAMPLE_PER_K·k — the SemDeDup
    deployment posture: train once offline, assign/verify online),
    per-batch SRP assignment against the broadcast centroids,
    per-batch within-cluster cosine verdicts against the accumulated
    store under earlier-batch-or-smaller-id precedence. Id-range
    bucketing makes that precedence coincide with plain vec_id order,
    so the verdict sink must EQUAL the batch ``semantic_dedup``
    flagship row for row — the oracle IS the flagship's SQL, verbatim
    (one derivation, two execution faces; the stream-vs-batch identity
    itself is pinned by tests/test_streaming_semdedup.py). Deriving k
    keeps the streaming gate on the scale path: per-trigger verify
    work is batch-rows × ~tcs cluster mates, linear. Building this
    query RUNS the stream (laziness-guard exempt); the declared result
    is a pruned parquet scan of the verdict sink."""
    import os
    import shutil
    import tempfile
    import time as _time

    from data_timeseries_java_spark.operators.similarity import (
        centroid_vectors,
        kmeans_centroids_fixedk,
    )
    from data_timeseries_java_spark.plans.materialize import materialize
    from data_timeseries_java_spark.streaming.semdedup_stream import (
        streaming_semantic_dedup,
    )
    from data_timeseries_java_spark.streaming.replay import (
        drive_query,
        write_replay_buckets_long,
    )

    cache_key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir))
    sink = _SEMDEDUP_REPLAY_SINKS.get(cache_key)
    if sink is None or not os.path.isdir(sink):
        emb = load_table(spark, sf_dir, "embeddings") \
            .select("vec_id", "embedding")
        n = emb.count()
        k = max(FIXEDK_K, n // derived_tcs(n))
        cent = materialize(centroid_vectors(kmeans_centroids_fixedk(
            emb, k=k, sample_size=SAMPLE_PER_K * k,
            iterations=KMEANS_ITERS)))
        lo, hi = emb.select(F.min("vec_id"), F.max("vec_id")).first()
        work = tempfile.mkdtemp(prefix="semdedup_stream_replay_")
        base = _time.time() - 1000
        write_replay_buckets_long(emb, F.col("vec_id"), f"{work}/in",
                                  3, int(lo), int(hi) - int(lo) + 1,
                                  base, ["vec_id"])
        src = (spark.readStream.schema(emb.schema)
               .option("maxFilesPerTrigger", 1).parquet(f"{work}/in/f*"))
        q = streaming_semantic_dedup(spark, src, f"{work}/gate", cent,
                                     _srp_signs(), threshold=SEMDEDUP_T,
                                     band_bits=SRP_BAND_BITS)
        drive_query(q, 600, "semantic dedup stream replay")
        sink = f"{work}/gate/verdicts"
        shutil.rmtree(f"{work}/in", ignore_errors=True)
        shutil.rmtree(f"{work}/gate/checkpoint", ignore_errors=True)
        _SEMDEDUP_REPLAY_SINKS[cache_key] = sink
    v = (spark.read.option("basePath", sink).parquet(sink)
         .drop("batch_id"))
    return v.select("vec_id", "centroid_id", "is_kept", "dup_of",
                    "max_dup_cos")


QUERIES["semantic_dedup_stream_replay"] = q_semantic_dedup_stream_replay
# one derivation, two execution faces: the stream's id-ordered
# precedence reproduces the batch derived-k flagship exactly, so the
# flagship's oracle applies verbatim
ORACLE["semantic_dedup_stream_replay"] = ORACLE["semantic_dedup"]


# ---- top principal component by power iteration --------------------------

PCA_ITERS = 12


def q_embedding_pca_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component (loading vector + eigenvalue) of the
    embedding cloud via unrolled power iteration over the Gram-
    accumulated global covariance — see
    operators.similarity.pca_top_component."""
    from data_timeseries_java_spark.operators.similarity import (
        pca_top_component)

    emb = load_table(spark, sf_dir, "embeddings")
    return pca_top_component(emb, iterations=PCA_ITERS)


QUERIES["embedding_pca_top"] = q_embedding_pca_top


def _pca_cte(iterations: int) -> str:
    """Unrolled power iteration as DuckDB CTEs, mirroring
    pca_top_component step for step (rounded covariance, v0 = e0,
    9-decimal re-rounding per iterate)."""
    sql = """
cross_sums AS MATERIALIZED (
  SELECT a.dim AS i, b.dim AS j,
         round(sum(CAST(a.x AS DOUBLE) * CAST(b.x AS DOUBLE)), 6) AS sxx
  FROM comp a JOIN comp b ON a.vec_id = b.vec_id AND a.dim <= b.dim
  GROUP BY a.dim, b.dim
),
dim_sums AS (
  SELECT dim, round(sum(CAST(x AS DOUBLE)), 6) AS s
  FROM comp GROUP BY dim
),
cnt AS (SELECT round(CAST(count(*) AS DOUBLE), 6) AS n FROM embeddings),
cov AS (
  SELECT c.i, c.j,
         round(c.sxx / t.n - (si.s / t.n) * (sj.s / t.n), 6) + 0.0 AS cov
  FROM cross_sums c
  CROSS JOIN cnt t
  JOIN dim_sums si ON si.dim = c.i
  JOIN dim_sums sj ON sj.dim = c.j
),
am AS MATERIALIZED (
  SELECT i, j, cov FROM cov
  UNION ALL
  SELECT j AS i, i AS j, cov FROM cov WHERE i <> j
),
v0 AS (SELECT 0 AS j, CAST(1.0 AS DOUBLE) AS v)"""
    # norm via an empty-frame window so each u{t} is referenced exactly
    # once — a separate norm CTE would inline u{t} twice per iteration
    # and blow the plan up exponentially (same hazard the Spark side
    # avoids with the one-row array iterate)
    for t in range(iterations):
        sql += f""",
u{t + 1} AS (
  SELECT am.i, sum(am.cov * v.v) AS u FROM am JOIN v{t} v ON v.j = am.j
  GROUP BY am.i
),
v{t + 1} AS (
  SELECT i AS j, round(u / sqrt(sum(u * u) OVER ()), 9) AS v
  FROM u{t + 1}
)"""
    return sql


_P = PCA_ITERS
ORACLE["embedding_pca_top"] = f"""
WITH {_COMP},
{_pca_cte(_P)},
uf AS (
  SELECT am.i, sum(am.cov * v.v) AS u FROM am JOIN v{_P} v ON v.j = am.j
  GROUP BY am.i
),
lam AS (
  SELECT round(sum(uf.u * v.v), 6) AS eigenvalue
  FROM uf JOIN v{_P} v ON v.j = uf.i
)
SELECT CAST(v.j AS BIGINT) AS dim, round(v.v, 6) AS loading, lam.eigenvalue
FROM v{_P} v CROSS JOIN lam
"""


# ---- ANN recall evaluation (approx vs exact ground truth) ----------------


def q_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the LSH ANN index against brute-force ground truth —
    the index-quality gate a similarity deployment runs after building:
    per query, |approx top-k ∩ exact top-k| / k. Composes the two
    declared pipelines unchanged (one semi-join + one aggregate on two
    k-row-per-query frames — evaluation cost is negligible next to
    either index)."""
    exact = q_knn_bruteforce(spark, sf_dir).select("query_id", "nbr_id")
    approx = q_ann_lsh(spark, sf_dir).select(
        F.col("query_id").alias("qa"), F.col("nbr_id").alias("na"))
    hits = (exact.join(
        approx, (F.col("query_id") == F.col("qa"))
        & (F.col("nbr_id") == F.col("na")))
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hits")))
    per_q = exact.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("k"))
    return (per_q.join(hits, "query_id", "left")
            .select("query_id",
                    F.coalesce(F.col("n_hits"), F.lit(0)).cast("long")
                    .alias("n_hits"),
                    F.round(F.coalesce(F.col("n_hits"), F.lit(0))
                            / F.col("k"), 6).alias("recall")))


QUERIES["ann_recall_eval"] = q_ann_recall_eval

ORACLE["ann_recall_eval"] = f"""
WITH exact AS (
  SELECT query_id, nbr_id FROM ({ORACLE["knn_bruteforce"]})
),
approx AS (
  SELECT query_id, nbr_id FROM ({ORACLE["ann_lsh"]})
),
hits AS (
  SELECT e.query_id, count(*) AS n_hits
  FROM exact e JOIN approx a
    ON a.query_id = e.query_id AND a.nbr_id = e.nbr_id
  GROUP BY e.query_id
),
per_q AS (SELECT query_id, count(*) AS k FROM exact GROUP BY query_id)
SELECT p.query_id,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       round(coalesce(h.n_hits, 0) * 1.0 / p.k, 6) AS recall
FROM per_q p LEFT JOIN hits h ON h.query_id = p.query_id
"""


# ---- embedding norm outliers (per-label QC) ------------------------------

NORM_OUT_Z = 2.0


def q_embedding_norm_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding-norm z-scores, flagging |z| >= 2 — the cheap
    embedding QC screen (a vector whose norm sits far from its label's
    distribution is a truncated, zeroed or mis-scaled encode). One
    narrow HOF norm column, one per-label moment aggregate broadcast
    back; z thresholds compare round(z, 9) (house threshold rule)."""
    from data_timeseries_java_spark.operators.similarity import with_norm

    emb = load_table(spark, sf_dir, "embeddings")
    base = with_norm(emb).select("vec_id", "label",
                                 F.col("_norm").alias("nrm"))
    stats = base.groupBy("label").agg(
        F.avg("nrm").alias("mu"),
        F.stddev_samp("nrm").alias("sd"),
        F.count(F.lit(1)).alias("n"))
    z = (F.col("nrm") - F.col("mu")) / F.col("sd")
    return (base.join(F.broadcast(stats), "label")
            .where(F.col("sd") > 0)
            .where(F.abs(F.round(z, 9)) >= NORM_OUT_Z)
            .select("vec_id", "label", F.round("nrm", 6).alias("norm"),
                    F.round(z, 6).alias("z")))


QUERIES["embedding_norm_outliers"] = q_embedding_norm_outliers

ORACLE["embedding_norm_outliers"] = f"""
WITH {_COMP},
stats AS (
  SELECT e.label, avg(n.nrm) AS mu, stddev_samp(n.nrm) AS sd
  FROM embeddings e JOIN norms n ON n.vec_id = e.vec_id
  GROUP BY e.label
)
SELECT e.vec_id, e.label, round(n.nrm, 6) AS norm,
       round((n.nrm - s.mu) / s.sd, 6) AS z
FROM embeddings e
JOIN norms n ON n.vec_id = e.vec_id
JOIN stats s ON s.label = e.label
WHERE s.sd > 0
  AND abs(round((n.nrm - s.mu) / s.sd, 9)) >= {NORM_OUT_Z}
"""


# ---- contrastive hard-negative mining -------------------------------------

HN_K = 3


def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive hard-negative mining: for each anchor vector, the
    top-k most-similar vectors with a DIFFERENT label — the negatives
    an embedding-training run pairs with its positives (highest-cosine
    wrong-label items are the gradient-rich ones). Anchors broadcast
    against the corpus with the label-mismatch predicate in the join
    (the knn_bruteforce shape); rank on round(cos, 9) with id
    tie-break. At 100 TB the anchor side is the small broadcast
    (queries/eval probes), exactly like knn; a corpus-x-corpus mining
    pass would go through the SRP/LSH banded candidates instead."""
    from data_timeseries_java_spark.operators.similarity import with_norm
    from data_timeseries_java_spark.functions.vectors import dot as _dot
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    a = (with_norm(emb.where(F.col("vec_id") < N_QUERIES))
         .select(F.col("vec_id").alias("anchor_id"),
                 F.col("label").alias("anchor_label"),
                 F.col("embedding").alias("_va"),
                 F.col("_norm").alias("_na")))
    c = (with_norm(emb)
         .select(F.col("vec_id").alias("nbr_id"),
                 F.col("label").alias("nbr_label"),
                 F.col("embedding").alias("_vb"),
                 F.col("_norm").alias("_nb")))
    cos = _dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb"))
    w = Window.partitionBy("anchor_id").orderBy(
        F.desc(F.round("cosine", 9)), F.asc("nbr_id"))
    return (c.join(F.broadcast(a),
                   F.col("anchor_label") != F.col("nbr_label"))
            .select("anchor_id", "anchor_label", "nbr_id", "nbr_label",
                    cos.alias("cosine"))
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= HN_K)
            .select("anchor_id", "anchor_label", "nbr_id", "nbr_label",
                    F.col("rank").cast("long").alias("rank"),
                    F.round("cosine", 6).alias("cosine")))


QUERIES["hard_negatives"] = q_hard_negatives

ORACLE["hard_negatives"] = f"""
WITH {_COMP},
lab AS (SELECT vec_id, label FROM embeddings),
dots AS (
  SELECT q.vec_id AS anchor_id, c.vec_id AS nbr_id,
         sum(CAST(q.x AS DOUBLE) * CAST(c.x AS DOUBLE)) AS dot
  FROM comp q JOIN comp c
    ON q.dim = c.dim AND q.vec_id < {N_QUERIES} AND q.label <> c.label
  GROUP BY q.vec_id, c.vec_id
),
scored AS (
  SELECT d.anchor_id, la.label AS anchor_label,
         d.nbr_id, lb.label AS nbr_label,
         d.dot / (na.nrm * nb.nrm) AS cosine
  FROM dots d
  JOIN norms na ON na.vec_id = d.anchor_id
  JOIN norms nb ON nb.vec_id = d.nbr_id
  JOIN lab la ON la.vec_id = d.anchor_id
  JOIN lab lb ON lb.vec_id = d.nbr_id
),
ranked AS (
  SELECT anchor_id, anchor_label, nbr_id, nbr_label, cosine,
         row_number() OVER (PARTITION BY anchor_id
                            ORDER BY round(cosine, 9) DESC, nbr_id ASC)
             AS rank
  FROM scored
)
SELECT anchor_id, anchor_label, nbr_id, nbr_label,
       CAST(rank AS BIGINT) AS rank, round(cosine, 6) AS cosine
FROM ranked WHERE rank <= {HN_K}
"""


def q_label_centroid_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise cosine similarity between LABEL CENTROIDS — the
    cluster-confusion-risk matrix that complements embedding_stats'
    per-label norms (two labels whose centroids sit close are the
    pair a classifier or dedup pass will blur). Per-dim mean via one
    posexplode aggregate (rounded to 9 — the same quantization the
    ann/kmeans oracles use), then the tiny labels x labels frame
    crosses in a broadcast."""
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    comp = emb.select(
        "label", F.posexplode("embedding").alias("dim", "x"))
    cent = (comp.groupBy("label", "dim")
            .agg(F.round(F.avg(F.col("x").cast("double")), 9)
                 .alias("m")))
    # per-label dot products with itself (norm) and every other label
    a = cent.select(F.col("label").alias("label1"), "dim",
                    F.col("m").alias("ma"))
    b = cent.select(F.col("label").alias("label2"), "dim",
                    F.col("m").alias("mb"))
    # quantize each per-dim product before the cross-partition sum
    # (house rounded-decomposable-sums rule): the 9-decimal means make
    # products 18-decimal-exact, so round(·, 12) is a pure noise strip
    # and the summation order can no longer flip the output's 6th
    # decimal between engines
    dots = (a.join(b, "dim")
            .groupBy("label1", "label2")
            .agg(F.sum(F.round(F.col("ma") * F.col("mb"), 12))
                 .alias("dot")))
    norms = (dots.where(F.col("label1") == F.col("label2"))
             .select(F.col("label1").alias("nl"),
                     F.sqrt("dot").alias("nrm")))
    na = norms.select(F.col("nl").alias("label1"),
                      F.col("nrm").alias("na"))
    nb = norms.select(F.col("nl").alias("label2"),
                      F.col("nrm").alias("nb"))
    return (dots.where(F.col("label1") < F.col("label2"))
            .join(F.broadcast(na), "label1")
            .join(F.broadcast(nb), "label2")
            .select("label1", "label2",
                    F.round(F.col("dot") / (F.col("na") * F.col("nb")),
                            6).alias("centroid_cosine")))


QUERIES["label_centroid_distances"] = q_label_centroid_distances

ORACLE["label_centroid_distances"] = f"""
WITH {_COMP},
cent AS (
  SELECT label, dim, round(avg(CAST(x AS DOUBLE)), 9) AS m
  FROM comp GROUP BY label, dim
),
dots AS (
  SELECT a.label AS label1, b.label AS label2,
         sum(round(a.m * b.m, 12)) AS dot
  FROM cent a JOIN cent b USING (dim)
  GROUP BY 1, 2
),
nrm AS (
  SELECT label1 AS nl, sqrt(dot) AS nrm
  FROM dots WHERE label1 = label2
)
SELECT d.label1, d.label2,
       round(d.dot / (x.nrm * y.nrm), 6) AS centroid_cosine
FROM dots d
JOIN nrm x ON x.nl = d.label1
JOIN nrm y ON y.nl = d.label2
WHERE d.label1 < d.label2
"""


# ---- Matryoshka truncation recall -----------------------------------------

MRL_DIMS = 16  # prefix dims for the truncated index (full = 64)


def q_ann_truncation_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style truncation study (after Kusupati et al. 2022,
    "Matryoshka Representation Learning", public): recall@k of exact
    top-k computed on only the FIRST MRL_DIMS embedding dimensions
    against the full-dimension ground truth — the sizing table that
    decides whether a deployment can serve the cheap prefix index.
    Both sides are the declared knn machinery (broadcast queries,
    streaming corpus, round(cos,9) rank ties); evaluation is one
    semi-join + one aggregate over two k-row-per-query frames, the
    ann_recall_eval pattern."""
    from data_timeseries_java_spark.operators.similarity import (
        knn_bruteforce,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    trunc = emb.select("vec_id",
                       F.slice("embedding", 1, MRL_DIMS)
                       .alias("embedding"))
    exact = q_knn_bruteforce(spark, sf_dir).select("query_id", "nbr_id")
    approx = knn_bruteforce(
        trunc, trunc.where(F.col("vec_id") < N_QUERIES),
        k=KNN_K).select(F.col("query_id").alias("qa"),
                        F.col("nbr_id").alias("na"))
    hits = (exact.join(
        approx, (F.col("query_id") == F.col("qa"))
        & (F.col("nbr_id") == F.col("na")))
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hits")))
    per_q = exact.groupBy("query_id").agg(F.count(F.lit(1)).alias("k"))
    return (per_q.join(hits, "query_id", "left")
            .select("query_id",
                    F.coalesce(F.col("n_hits"), F.lit(0)).cast("long")
                    .alias("n_hits"),
                    F.round(F.coalesce(F.col("n_hits"), F.lit(0))
                            / F.col("k"), 6).alias("recall")))


QUERIES["ann_truncation_recall"] = q_ann_truncation_recall

_KNN_TRUNC_SQL = f"""
WITH compt AS (
  SELECT vec_id,
         unnest(embedding[1:{MRL_DIMS}]) AS x,
         unnest(generate_series(0, {MRL_DIMS} - 1)) AS dim
  FROM embeddings
),
normst AS (
  SELECT vec_id, sqrt(sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS nrm
  FROM compt GROUP BY vec_id
),
dots AS (
  SELECT q.vec_id AS query_id, c.vec_id AS nbr_id,
         sum(CAST(q.x AS DOUBLE) * CAST(c.x AS DOUBLE)) AS dot
  FROM compt q JOIN compt c
    ON q.dim = c.dim AND q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
  GROUP BY q.vec_id, c.vec_id
),
scored AS (
  SELECT d.query_id, d.nbr_id, d.dot / (nq.nrm * nc.nrm) AS cosine
  FROM dots d
  JOIN normst nq ON nq.vec_id = d.query_id
  JOIN normst nc ON nc.vec_id = d.nbr_id
),
ranked AS (
  SELECT query_id, nbr_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round(cosine, 9) DESC, nbr_id ASC)
           AS rank
  FROM scored
)
SELECT query_id, nbr_id FROM ranked WHERE rank <= {KNN_K}
"""

ORACLE["ann_truncation_recall"] = f"""
WITH exact AS (
  SELECT query_id, nbr_id FROM ({_KNN_SQL})
),
approx AS ({_KNN_TRUNC_SQL}),
hits AS (
  SELECT e.query_id, count(*) AS n_hits
  FROM exact e JOIN approx a
    ON a.query_id = e.query_id AND a.nbr_id = e.nbr_id
  GROUP BY e.query_id
),
per_q AS (SELECT query_id, count(*) AS k FROM exact GROUP BY query_id)
SELECT p.query_id,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       round(coalesce(h.n_hits, 0) * 1.0 / p.k, 6) AS recall
FROM per_q p LEFT JOIN hits h ON h.query_id = p.query_id
"""


# ---- two-stage retrieve -> rerank (Matryoshka serving path) ---------------

RERANK_RETRIEVE_N = 30


def q_ann_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serving-path companion to ann_truncation_recall (round-13, the
    r12 VERDICT's suggested reranking lane): retrieve RERANK_RETRIEVE_N
    candidates per query on the cheap MRL_DIMS-prefix index, then
    re-score only those with the full-dimension exact cosine — the
    cross-encoder-shaped second stage — and keep the top KNN_K with
    the stage-1 rank carried as the rerank-movement diagnostic. See
    operators.similarity.ann_rerank_topk."""
    from data_timeseries_java_spark.operators.similarity import (
        ann_rerank_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < N_QUERIES)
    return ann_rerank_topk(emb, queries, k=KNN_K,
                           retrieve_n=RERANK_RETRIEVE_N,
                           prefix_dims=MRL_DIMS)


QUERIES["ann_rerank"] = q_ann_rerank

ORACLE["ann_rerank"] = f"""
WITH compt AS (
  SELECT vec_id,
         unnest(embedding[1:{MRL_DIMS}]) AS x,
         unnest(generate_series(0, {MRL_DIMS} - 1)) AS dim
  FROM embeddings
),
normst AS (
  SELECT vec_id, sqrt(sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS nrm
  FROM compt GROUP BY vec_id
),
dotst AS (
  SELECT q.vec_id AS query_id, c.vec_id AS nbr_id,
         sum(CAST(q.x AS DOUBLE) * CAST(c.x AS DOUBLE)) AS dot
  FROM compt q JOIN compt c
    ON q.dim = c.dim AND q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
  GROUP BY q.vec_id, c.vec_id
),
retrieved AS (
  SELECT query_id, nbr_id,
         row_number() OVER (PARTITION BY query_id
             ORDER BY round(d.dot / (nq.nrm * nc.nrm), 9) DESC,
                      nbr_id ASC) AS retrieve_rank
  FROM dotst d
  JOIN normst nq ON nq.vec_id = d.query_id
  JOIN normst nc ON nc.vec_id = d.nbr_id
),
cand AS (
  SELECT query_id, nbr_id, CAST(retrieve_rank AS BIGINT) AS retrieve_rank
  FROM retrieved WHERE retrieve_rank <= {RERANK_RETRIEVE_N}
),
compf AS (
  SELECT vec_id,
         unnest(embedding) AS x,
         unnest(generate_series(0, len(embedding) - 1)) AS dim
  FROM embeddings
),
normsf AS (
  SELECT vec_id, sqrt(sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS nrm
  FROM compf GROUP BY vec_id
),
fdots AS (
  SELECT ca.query_id, ca.nbr_id, ca.retrieve_rank,
         sum(CAST(q.x AS DOUBLE) * CAST(c.x AS DOUBLE)) AS dot
  FROM cand ca
  JOIN compf q ON q.vec_id = ca.query_id
  JOIN compf c ON c.vec_id = ca.nbr_id AND c.dim = q.dim
  GROUP BY ca.query_id, ca.nbr_id, ca.retrieve_rank
),
reranked AS (
  SELECT f.query_id, f.nbr_id, f.retrieve_rank,
         f.dot / (nq.nrm * nc.nrm) AS cosine,
         row_number() OVER (PARTITION BY f.query_id
             ORDER BY round(f.dot / (nq.nrm * nc.nrm), 9) DESC,
                      f.nbr_id ASC) AS rank
  FROM fdots f
  JOIN normsf nq ON nq.vec_id = f.query_id
  JOIN normsf nc ON nc.vec_id = f.nbr_id
)
SELECT query_id, nbr_id, CAST(rank AS BIGINT) AS rank,
       round(cosine, 6) AS cosine, retrieve_rank
FROM reranked WHERE rank <= {KNN_K}
"""
