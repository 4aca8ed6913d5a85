"""IVF ANN quality: k-means-trained centroids must beat the seed set.

The point of training (VERDICT r1 #5): Lloyd's iterations move the
coarse quantizer toward the data's actual cluster structure, so probing
the same number of lists recovers more of the exact top-k.
"""

import pytest


def _pairs(df):
    return {(r.query_id, r.nbr_id) for r in df.collect()}


@pytest.fixture(scope="module")
def recall(spark, sf_dir):
    from data_timeseries_java_spark.queries.similarity import (
        q_ann_ivf, q_ann_ivf_trained, q_knn_bruteforce)

    exact = _pairs(q_knn_bruteforce(spark, sf_dir))
    seed = _pairs(q_ann_ivf(spark, sf_dir))
    trained = _pairs(q_ann_ivf_trained(spark, sf_dir))
    return (len(seed & exact) / len(exact),
            len(trained & exact) / len(exact))


def test_trained_centroids_beat_seed_recall(recall):
    seed_recall, trained_recall = recall
    assert trained_recall > seed_recall, (
        f"k-means training did not improve recall@k: "
        f"seed={seed_recall:.3f} trained={trained_recall:.3f}")


def test_trained_recall_is_useful(recall):
    # approximate search with 3 of ~10 lists probed should still recover
    # a meaningful fraction of the exact neighbors
    _, trained_recall = recall
    assert trained_recall >= 0.5


def test_probe_count_recall_curve(spark, sf_dir):
    """The IVF quality/cost knob must behave: probing more lists
    monotonically (non-strictly) improves recall toward exact top-k."""
    from pyspark.sql import functions as F

    from data_timeseries_java_spark.operators.similarity import (
        centroid_vectors, ivf_topk, kmeans_centroids)
    from data_timeseries_java_spark.queries.similarity import (
        KMEANS_ITERS, KNN_K, N_CENTROIDS_STRIDE, N_QUERIES,
        q_knn_bruteforce)
    from data_timeseries_java_spark.tables import load_table

    exact = _pairs(q_knn_bruteforce(spark, sf_dir))
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < N_QUERIES).select("vec_id")
    cent = centroid_vectors(kmeans_centroids(
        emb, seed_stride=N_CENTROIDS_STRIDE, iterations=KMEANS_ITERS))
    recalls = []
    for n_probe in (1, 3, 5):
        got = _pairs(ivf_topk(emb, queries, cent, k=KNN_K, n_probe=n_probe))
        recalls.append(len(got & exact) / len(exact))
    assert recalls == sorted(recalls), recalls
    assert recalls[-1] > recalls[0]


def test_int8_quantization_preserves_neighbors(spark, sf_dir):
    """Fidelity contract for embedding_quantize's int8 scheme: kNN over
    dequantized vectors must recover >= 90% of the float top-k pairs
    (absmax int8 keeps cosine structure nearly intact)."""
    from pyspark.sql import functions as F

    from data_timeseries_java_spark.operators.similarity import (
        knn_bruteforce)
    from data_timeseries_java_spark.queries.similarity import (
        KNN_K, N_QUERIES, q_knn_bruteforce)
    from data_timeseries_java_spark.tables import load_table

    exact = _pairs(q_knn_bruteforce(spark, sf_dir))
    emb = load_table(spark, sf_dir, "embeddings")
    x = F.col("embedding")
    absmax = F.aggregate(
        x, F.lit(0.0), lambda a, v: F.greatest(a, F.abs(v.cast("double"))))
    scale = absmax / F.lit(127.0)
    deq = emb.where(absmax > 0).select(
        "vec_id", "label",
        F.transform(x, lambda v: (F.floor(v.cast("double") / scale + 0.5)
                                  * scale).cast("float")).alias("embedding"))
    queries = deq.where(F.col("vec_id") < N_QUERIES)
    got = _pairs(knn_bruteforce(deq, queries, k=KNN_K))
    assert len(got & exact) / len(exact) >= 0.9


def test_semantic_dedup_verdict_rules(spark, sf_dir):
    """Dropped vectors always point at a lower-id cluster-mate; keepers
    have no qualifying lower-id mate (brute-force within-cluster numpy
    check); verdicts partition the corpus."""
    import numpy as np
    from pyspark.sql import functions as F

    from data_timeseries_java_spark.operators.similarity import (
        centroid_vectors, kmeans_centroids, semantic_dedup)
    from data_timeseries_java_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    cent = centroid_vectors(kmeans_centroids(emb, seed_stride=50,
                                             iterations=3))
    out = semantic_dedup(emb, cent, threshold=0.3).collect()
    vecs = {r.vec_id: np.asarray(r.embedding, dtype=np.float64)
            for r in emb.collect()}
    assert len(out) == len(vecs)

    clusters = {}
    for r in out:
        clusters.setdefault(r.centroid_id, []).append(r.vec_id)

    def cos(a, b):
        va, vb = vecs[a], vecs[b]
        return round(float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb))), 9)

    n_dropped = 0
    for r in out:
        mates = [m for m in clusters[r.centroid_id] if m < r.vec_id]
        qualifying = [m for m in mates if cos(m, r.vec_id) >= 0.3]
        if r.is_kept:
            assert not qualifying and r.dup_of is None
        else:
            n_dropped += 1
            assert r.dup_of == min(qualifying)
            assert r.max_dup_cos is not None
    assert 0 < n_dropped < len(out)  # threshold is meaningful on this corpus


def test_pca_top_component_matches_numpy(spark, sf_dir):
    """The operator's iterate sequence equals the same rounded power
    iteration in numpy, and after 12 iterations it is numerically the
    dominant eigenvector of the (rounded) covariance."""
    import numpy as np

    from data_timeseries_java_spark.operators.similarity import (
        pca_top_component)
    from data_timeseries_java_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    out = sorted(pca_top_component(emb, iterations=12).collect(),
                 key=lambda r: r.dim)
    v_spark = np.array([r.loading for r in out])
    lam_spark = out[0].eigenvalue

    X = np.stack([np.asarray(r.embedding, dtype=np.float64)
                  for r in emb.collect()])
    n, d = X.shape
    # replicate the operator's rounded-sums covariance
    sxx = np.round(X.T @ X, 6)
    s = np.round(X.sum(axis=0), 6)
    cov = np.round(sxx / n - np.outer(s / n, s / n), 6)
    cov = np.triu(cov) + np.triu(cov, 1).T  # mirrored upper triangle
    v = np.zeros(d); v[0] = 1.0
    for _ in range(12):
        u = cov @ v
        v = np.round(u / np.sqrt((u * u).sum()), 9)
    assert np.allclose(v_spark, np.round(v, 6), atol=2e-6)
    assert abs(lam_spark - round(float(v @ cov @ v), 6)) < 1e-5
    # convergence is spectral-gap-limited at a fixed iteration count
    # (like the fixed-iteration k-means): assert the Rayleigh quotient
    # has climbed into the top of the spectrum, not exact dominance
    w = np.linalg.eigvalsh(cov)
    assert lam_spark <= np.max(w) + 1e-6
    assert lam_spark >= 0.85 * np.max(w)
    assert lam_spark > np.sort(w)[-3]  # above the 3rd eigenvalue


def test_srp_assign_identical_vector_hits_its_centroid(spark):
    """A vector that IS a centroid collides with it in EVERY band (the
    integer SRP signature is a pure function of the quantized vector),
    so srp_assign must place it in that centroid's cluster with exact
    cosine 1 beating any other candidate."""
    from pyspark.sql import Row

    from data_timeseries_java_spark.operators.similarity import srp_assign
    from data_timeseries_java_spark.queries.similarity import (
        SRP_BAND_BITS, SRP_DIM, _srp_signs)

    base = [float((i * 37) % 11 - 5) or 1.0 for i in range(SRP_DIM)]
    other = [float((i * 53) % 13 - 6) or 2.0 for i in range(SRP_DIM)]
    cents = spark.createDataFrame([
        Row(vec_id=0, embedding=base),
        Row(vec_id=1, embedding=other)])
    vecs = spark.createDataFrame([
        Row(vec_id=100, embedding=base),          # exact centroid copy
        Row(vec_id=101, embedding=[x * 2.0 for x in base])])  # scaled
    out = {r.vec_id: r.centroid_id
           for r in srp_assign(vecs, cents, _srp_signs(),
                               band_bits=SRP_BAND_BITS).collect()}
    assert out[100] == 0
    # cosine is scale-invariant AND the quantized signature is too
    # (absmax/127 normalizes the scale away): the doubled copy follows
    assert out[101] == 0


def test_semantic_dedup_ann_unassigned_are_kept(spark, sf_dir):
    """Cluster -1 rows (no band collision) must always be kept with
    null dup metadata — a miss may only under-dedup."""
    from data_timeseries_java_spark.queries.similarity import (
        q_semantic_dedup_ann)

    rows = q_semantic_dedup_ann(spark, sf_dir).where("centroid_id = -1") \
        .collect()
    assert all(r.is_kept and r.dup_of is None and r.max_dup_cos is None
               for r in rows)


@pytest.mark.slow  # 359 s: 21x corpus replication across the tcs grid
def test_semantic_dedup_derived_k_beyond_floor(spark, sf_dir, tmp_path_factory):
    """The unsuffixed flagship derives BOTH integers from corpus size
    (tcs = derived_tcs(n), k = max(FIXEDK_K, n // tcs)) and its oracle
    derives them the same way in SQL — so the two must agree PAST the
    k = FIXEDK_K floor AND past the first tcs grid switch above the
    smallest SF (tcs 64->128 at n = 2,622), not just at the oracle
    SFs. Replicate the embeddings 6x with offset ids (n = 3,000 ->
    tcs = 128, k = 23, S = 575) and hash-compare Spark vs DuckDB on
    the enlarged corpus (round-12 VERDICT #1/#2; round-13 crosses the
    grid switch)."""
    import duckdb

    from data_timeseries_java_spark.queries import all_oracles
    from data_timeseries_java_spark.queries.similarity import (
        FIXEDK_K, TCS_MIN_LOG2, derived_tcs, q_semantic_dedup)
    from scripts.oracle_check import compare

    out = tmp_path_factory.mktemp("semdedup_bigk")
    src = f"{sf_dir}/embeddings.parquet"
    con = duckdb.connect()
    con.execute(f"""
        COPY (
          SELECT e.vec_id + t.r * 1000 AS vec_id, e.embedding, e.label
          FROM read_parquet('{src}') e, range(6) t(r)
        ) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
    """)
    n = con.execute(
        f"SELECT count(*) FROM '{out}/embeddings.parquet'").fetchone()[0]
    tcs = derived_tcs(n)
    assert tcs > 2 ** TCS_MIN_LOG2, "fixture must cross the grid switch"
    assert n // tcs > FIXEDK_K, "fixture must clear the floor"

    sdf = q_semantic_dedup(spark, str(out)).toPandas()
    oracle_con = duckdb.connect()
    oracle_con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{out}/embeddings.parquet'")
    ddf = oracle_con.execute(all_oracles()["semantic_dedup"]).fetchdf()
    problems = compare("semantic_dedup_bigk", sdf, ddf)
    assert not problems, problems


def test_semantic_dedup_kernel_matches_declarative(spark, sf_dir):
    """The kernelized flagship path (semantic_dedup_autok: numpy
    Lloyd's on the sample, broadcast banded assignment, chunked-Gram
    verdicts) must produce IDENTICAL rows to the declarative fixed-k +
    SRP composition it replaces — that identity is what lets the one
    DuckDB oracle cover the kernel (the pairwise_correlations_auto
    precedent)."""
    from data_timeseries_java_spark.operators.similarity import (
        centroid_vectors,
        kmeans_centroids_fixedk,
        semantic_dedup_ann,
        semantic_dedup_autok,
    )
    from data_timeseries_java_spark.plans.materialize import materialize
    from data_timeseries_java_spark.queries.similarity import (
        KMEANS_ITERS, SEMDEDUP_T, SRP_BAND_BITS, _srp_signs)
    from data_timeseries_java_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    k, s = 10, 250
    cent = materialize(centroid_vectors(kmeans_centroids_fixedk(
        emb, k=k, sample_size=s, iterations=KMEANS_ITERS)))
    decl = semantic_dedup_ann(
        emb, cent, _srp_signs(), threshold=SEMDEDUP_T,
        band_bits=SRP_BAND_BITS).toPandas().sort_values(
        "vec_id").reset_index(drop=True)
    kern = semantic_dedup_autok(
        emb, k=k, signs=_srp_signs(), sample_size=s,
        iterations=KMEANS_ITERS, threshold=SEMDEDUP_T,
        band_bits=SRP_BAND_BITS).toPandas().sort_values(
        "vec_id").reset_index(drop=True)
    assert len(decl) == len(kern)
    for c in decl.columns:
        a, b = decl[c], kern[c]
        same = (a.isna() & b.isna()) | (a == b)
        assert same.all(), f"kernel/declarative diverge on {c}"


def test_derived_tcs_sql_python_lockstep():
    """The tcs grid snap must be the SAME integer function in Python
    (plan-build) and DuckDB (oracle CTE) — exercised across every grid
    boundary up to the cap, including the exact switch points and the
    int64-safety corner (no 800*n multiply on the SQL side)."""
    import duckdb

    from data_timeseries_java_spark.queries.similarity import (
        _tcs_case_sql, _tcs_threshold, derived_tcs, TCS_MIN_LOG2,
        TCS_MAX_LOG2)

    con = duckdb.connect()
    ns = [1, 40, 41, 500, 2000, 2621, 2622, 3000, 10**10, 9 * 10**17]
    for j in range(TCS_MIN_LOG2 + 1, TCS_MAX_LOG2 + 1):
        t = _tcs_threshold(j)
        ns.extend([t - 1, t])
    for n in ns:
        got = con.execute(f"SELECT {_tcs_case_sql(str(n))}").fetchone()[0]
        assert got == derived_tcs(n), (n, got, derived_tcs(n))
    # the documented switch the parity fixture crosses
    assert derived_tcs(2621) == 64 and derived_tcs(2622) == 128


def test_ann_rerank_semantics(spark, sf_dir):
    """The two-stage serving path: every returned neighbor must come
    from the stage-1 prefix-index top-RERANK_RETRIEVE_N (retrieve_rank
    bound), each query returns exactly KNN_K rows, and the final order
    equals the full-precision cosine order restricted to those
    candidates (rank agrees with knn_bruteforce's full-dim scores on
    the candidate subset)."""
    from data_timeseries_java_spark.queries.similarity import (
        KNN_K, N_QUERIES, RERANK_RETRIEVE_N, q_ann_rerank,
        q_knn_bruteforce)

    out = q_ann_rerank(spark, sf_dir).toPandas()
    assert set(out["query_id"].unique()) == set(range(N_QUERIES))
    per_q = out.groupby("query_id").size()
    assert (per_q == KNN_K).all()
    assert out["retrieve_rank"].between(1, RERANK_RETRIEVE_N).all()
    # full-precision agreement: where the exact top-k neighbor IS in
    # the candidate set, the rerank must score it identically
    exact = q_knn_bruteforce(spark, sf_dir).toPandas()
    merged = out.merge(exact, on=["query_id", "nbr_id"],
                       suffixes=("_rr", "_ex"))
    assert not merged.empty
    assert (merged["cosine_rr"] == merged["cosine_ex"]).all()
    # rank within the candidate subset is descending cosine
    for _, g in out.groupby("query_id"):
        g = g.sort_values("rank")
        assert (g["cosine"].round(9).diff().dropna() <= 1e-12).all()


def test_semantic_dedup_kernel_coarse_matches_dense(spark, sf_dir):
    """The two-level coarse assignment kernel (round-14, VERDICT r13
    #2) must produce rows IDENTICAL to the dense kernel — the coarse
    path prunes cells only when their Cauchy-Schwarz upper bound
    clears the round-9 tie band, so it inherits the declarative
    oracle's coverage through the same identity chain. Forces a k
    above COARSE_MIN_K so the coarse structure is genuinely exercised
    (sqrt(k) cells, multi-member), and forces coarse_cells on/off
    explicitly."""
    from data_timeseries_java_spark.operators.similarity import (
        COARSE_MIN_K,
        semantic_dedup_autok,
    )
    from data_timeseries_java_spark.queries.similarity import (
        KMEANS_ITERS, SEMDEDUP_T, SRP_BAND_BITS, _srp_signs)
    from data_timeseries_java_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    k = COARSE_MIN_K + 8
    s = 4 * k  # smaller-than-default sample keeps the fixture quick
    kwargs = dict(k=k, signs=_srp_signs(), sample_size=s,
                  iterations=KMEANS_ITERS, threshold=SEMDEDUP_T,
                  band_bits=SRP_BAND_BITS)
    dense = semantic_dedup_autok(
        emb, coarse_cells=0, **kwargs).toPandas().sort_values(
        "vec_id").reset_index(drop=True)
    coarse = semantic_dedup_autok(
        emb, coarse_cells=int(round(k ** 0.5)),
        **kwargs).toPandas().sort_values(
        "vec_id").reset_index(drop=True)
    assert len(dense) == len(coarse) > 0
    assert (dense["centroid_id"] != -1).any()
    for c in dense.columns:
        a, b = dense[c], coarse[c]
        same = (a.isna() & b.isna()) | (a == b)
        assert same.all(), f"coarse/dense diverge on {c}"


def test_oracle_constant_echo_tcs_k_s():
    """Constant-echo for the oracle-pinned engine constants (VERDICT
    r13 #6): TRAIN_PARALLELISM_RATIO / SAMPLE_PER_K / FIXEDK_K / the
    tcs grid bounds exist in Python AND inside generated SQL text, so
    a future edit to one side must not silently pass. Three locks:

    1. the threshold integers are re-derived here from the raw
       constants (tcs^3 = SAMPLE_PER_K * C * n, integerized) and must
       equal _tcs_threshold's output at every grid point;
    2. DuckDB evaluating the oracle's OWN fn/fk scalar fragment must
       produce the same (tcs, k, S) triple as the Python plan-build
       rule at every grid boundary +-1 (floor-div, greatest, CASE
       text all exercised);
    3. the registered flagship oracle STRING must embed the
       freshly-regenerated CASE verbatim — a hand-hardcoded copy that
       drifts from the constants fails here even if it parses."""
    import duckdb

    from data_timeseries_java_spark.queries.similarity import (
        FIXEDK_K, ORACLE, SAMPLE_PER_K, TCS_MAX_LOG2, TCS_MIN_LOG2,
        TRAIN_PARALLELISM_RATIO, _tcs_case_sql, _tcs_threshold,
        derived_tcs)

    c = SAMPLE_PER_K * TRAIN_PARALLELISM_RATIO
    ns = {1, 2, 100, 2500, 10 ** 6, 10 ** 9}
    for j in range(TCS_MIN_LOG2, TCS_MAX_LOG2 + 1):
        assert _tcs_threshold(j) == (8 ** j + c - 1) // c  # lock 1
        ns.update({_tcs_threshold(j) - 1, _tcs_threshold(j),
                   _tcs_threshold(j) + 1})

    con = duckdb.connect()
    case = _tcs_case_sql("n")
    for n in sorted(x for x in ns if x >= 1):
        tcs_sql, k_sql = con.execute(f"""
            WITH fn AS (SELECT CAST({n} AS BIGINT) AS n),
            fk AS (
              SELECT greatest({FIXEDK_K},
                              CAST(n // ({case}) AS BIGINT)) AS k
              FROM fn)
            SELECT ({case}), k FROM fn, fk""").fetchone()
        tcs_py = derived_tcs(n)
        k_py = max(FIXEDK_K, n // tcs_py)
        assert tcs_sql == tcs_py, (n, tcs_sql, tcs_py)   # lock 2
        assert k_sql == k_py, (n, k_sql, k_py)
        # S = SAMPLE_PER_K * k on both sides by construction of the
        # fsamp rank filter (r <= fk.k * SAMPLE_PER_K)
    assert case in ORACLE["semantic_dedup"]              # lock 3
    assert f"fk.k * {SAMPLE_PER_K}" in ORACLE["semantic_dedup"]


def test_ivf_assign_kernel_matches_declarative(spark, sf_dir):
    """The kernelized IVF assignment (broadcast centroid matrix, one
    mapInPandas scan, lazy-round winner) must assign every vector to
    the SAME centroid as the declarative crossJoin + max-struct rank —
    the identity that lets ann_ivf_two_level's oracle cover the
    kernel path (the pairwise_correlations_auto precedent)."""
    import pyspark.sql.functions as F

    from data_timeseries_java_spark.operators.similarity import (
        ivf_assign, ivf_assign_kernel)
    from data_timeseries_java_spark.queries.similarity import (
        IVF_SEED_CAP, N_CENTROIDS_STRIDE)
    from data_timeseries_java_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    cent = emb.where((F.col("vec_id") % N_CENTROIDS_STRIDE == 0)
                     & (F.col("vec_id") < IVF_SEED_CAP))
    decl = (ivf_assign(emb, cent).toPandas()
            .sort_values("vec_id").reset_index(drop=True))
    kern = (ivf_assign_kernel(emb, cent).toPandas()
            .sort_values("vec_id").reset_index(drop=True))
    assert len(decl) == len(kern) > 0
    assert (decl["vec_id"] == kern["vec_id"]).all()
    assert (decl["centroid_id"] == kern["centroid_id"]).all()
