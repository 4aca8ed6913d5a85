"""Scale-shape queries: skew-resilient aggregation, mergeable HLL
sketches, and deterministic OLS trend/forecast.

The skew rewrites (`operators/skew.py`) are oracle-checked against the
naive GROUP BY — proving the two-phase split is semantics-preserving —
while the plan tests pin that the hot key actually spreads. The sketch
tier emits VERIFIABLE CLAIMS rather than raw estimates: sketch values
are engine-specific (no DuckDB-identical counterpart), but "the
estimate is within its published error bound of the exact answer" and
"the mergeable rollup equals the single-shot sketch" are booleans the
oracle can hash-match exactly (the oracle asserts TRUE; a violated
bound flips the Spark side to false and fails the hash). The raw
estimates stay covered by `tests/test_skew.py`.

No reference counterpart (SURVEY.md §2.7): the reference never faces
skewed keys or >1-node cardinality estimation; these are engine-grade
additions for the 100 TB story.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_timeseries_java_spark.operators.skew import (
    cms_heavy_hitters,
    salted_agg,
    two_phase_distinct,
)
from data_timeseries_java_spark.tables import load_table

N_SALTS = 8


def q_distinct_users_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users per event type via the skew-safe two-phase
    reduce-on-pair shape (phase 1 partitions by hash(type, user), so a
    hot type never lands on one reducer)."""
    ev = load_table(spark, sf_dir, "events")
    return (two_phase_distinct(ev, ["event_type"], "user_id", "n_users")
            .select("event_type", F.col("n_users").cast("long").alias("n_users")))


def q_salted_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type event stats through an explicit 8-way salt: phase 1
    pre-aggregates on (type, salt), phase 2 combines partials. Output
    is oracle-identical to the plain GROUP BY (rounded sums — see
    queries/__init__ note on cross-engine float policy)."""
    ev = load_table(spark, sf_dir, "events")
    combined = salted_agg(
        ev, ["event_type"], "event_id", N_SALTS,
        {
            "n_events": (F.count(F.lit(1)), F.sum("n_events")),
            "sum_value": (F.sum("value"), F.sum("sum_value")),
            "min_value": (F.min("value"), F.min("min_value")),
            "max_value": (F.max("value"), F.max("max_value")),
        })
    return combined.select(
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        F.round("sum_value", 2).alias("sum_value"),
        F.round("min_value", 6).alias("min_value"),
        F.round("max_value", 6).alias("max_value"))


def q_value_trend_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag least-squares fit of extendedprice on quantity,
    plus the fitted value at quantity=50 — closed-form OLS from five
    decomposable sums (the distributed-regression shape; equivalent to
    regr_slope/regr_intercept but computed from ROUNDED sums so both
    engines do bit-identical arithmetic downstream of the reduction).
    One map-side-combined shuffle over lineitem; no iteration."""
    li = load_table(spark, sf_dir, "lineitem")
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    s = li.groupBy(F.col("l_returnflag").alias("flag")).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.round(F.sum(x), 2).alias("sx"),
        F.round(F.sum(y), 2).alias("sy"),
        F.round(F.sum(x * x), 2).alias("sxx"),
        F.round(F.sum(x * y), 2).alias("sxy"))
    slope = F.round(
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")), 6)
    s = s.withColumn("slope", slope)
    s = s.withColumn(
        "intercept",
        F.round((F.col("sy") - F.col("slope") * F.col("sx")) / F.col("n"), 6))
    return s.select(
        "flag", F.col("n").cast("long").alias("n"), "slope", "intercept",
        F.round(F.col("intercept") + F.col("slope") * 50, 6)
        .alias("forecast_at_50"))


# Relative-error bound asserted for the HLL claims: hll_sketch_agg
# defaults to lgK=12 (rsd ~1.6%) and approx_count_distinct is called at
# rsd 2%; 5% is ~3 sigma for both — a deterministic pass on correct
# sketches, a hash-failing `false` on a broken one.
HLL_REL_ERR = 0.05


def q_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct-user estimate per event type (rsd 2%),
    emitted as a VERIFIABLE CLAIM: the exact count plus a boolean that
    the estimate lies within HLL_REL_ERR of it. The exact distinct and
    the sketch share one shuffle (same groupBy); the oracle hash-matches
    (event_type, n_exact, TRUE) — see the module docstring."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.02).alias("approx"),
        F.count_distinct("user_id").alias("n_exact"))
    within = (F.abs(F.col("approx") - F.col("n_exact"))
              <= F.col("n_exact") * F.lit(HLL_REL_ERR))
    return agg.select("event_type",
                      F.col("n_exact").cast("long").alias("n_exact"),
                      within.alias("within_bound"))


def q_hll_user_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup: one DataSketches HLL per (type, day),
    unioned up to per-type estimates WITHOUT rescanning the events —
    the shape that makes incremental 100 TB cardinality rollups cheap
    (daily sketches persist; the union is sketch-sized). Emitted as
    VERIFIABLE CLAIMS: the rollup estimate is within HLL_REL_ERR of the
    exact count, and the union-of-daily-sketches estimate equals the
    single-shot whole-table sketch (register max-merge is lossless).
    The single-shot/exact side joins in as a broadcast (rows = #types)."""
    ev = load_table(spark, sf_dir, "events")
    daily = (ev.groupBy("event_type", F.to_date("ts").alias("day"))
             .agg(F.hll_sketch_agg("user_id").alias("sk")))
    rolled = (daily.groupBy("event_type")
              .agg(F.hll_sketch_estimate(F.hll_union_agg("sk"))
                   .alias("rollup_est")))
    single = ev.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("single_est"),
        F.count_distinct("user_id").alias("n_exact"))
    j = rolled.join(F.broadcast(single), "event_type")
    within = (F.abs(F.col("rollup_est") - F.col("n_exact"))
              <= F.col("n_exact") * F.lit(HLL_REL_ERR))
    return j.select(
        "event_type",
        F.col("n_exact").cast("long").alias("n_exact"),
        within.alias("within_bound"),
        (F.col("rollup_est") == F.col("single_est"))
        .alias("union_matches_single_shot"))


# GK sketch accuracy parameter: rank error <= n/GK_ACCURACY (+1 for the
# discrete-rank boundary)
GK_ACCURACY = 1000


def q_approx_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate per-type value percentiles (Greenwald-Khanna style
    sketch, accuracy 1/1000) — the bounded-memory path for quantiles at
    100 TB, complementing the exact interpolated `price_quantiles`.
    Emitted as VERIFIABLE CLAIMS: for each q in {0.5, 0.9, 0.99} the
    returned value's rank interval [count(< v)+1, count(<= v)] must
    intersect [q*n - err, q*n + err] with err = n/GK_ACCURACY + 1 — the
    GK guarantee. The rank counts come from one broadcast join of the
    tiny per-type sketch frame back onto events (types x rows
    conditional count, one extra scan, no extra shuffle of events)."""
    ev = load_table(spark, sf_dir, "events")
    pct = F.percentile_approx("value", F.array(
        F.lit(0.5), F.lit(0.9), F.lit(0.99)), F.lit(GK_ACCURACY))
    approx = ev.groupBy("event_type").agg(pct.alias("p"))
    j = ev.join(F.broadcast(approx), "event_type")
    aggs = [F.count(F.lit(1)).alias("n")]
    for i, tag in enumerate(["p50", "p90", "p99"]):
        v = F.col("p")[i]
        aggs += [
            F.sum(F.when(F.col("value") < v, 1).otherwise(0)).alias(f"{tag}_lt"),
            F.sum(F.when(F.col("value") <= v, 1).otherwise(0)).alias(f"{tag}_le"),
        ]
    ranks = j.groupBy("event_type").agg(*aggs)
    out_cols = [F.col("event_type"), F.col("n").cast("long").alias("n_events")]
    for q, tag in [(0.5, "p50"), (0.9, "p90"), (0.99, "p99")]:
        err = F.col("n") / GK_ACCURACY + 1
        target = F.col("n") * F.lit(q)
        ok = ((F.col(f"{tag}_lt") + 1 <= target + err)
              & (F.col(f"{tag}_le") >= target - err))
        out_cols.append(ok.alias(f"{tag}_in_bound"))
    return ranks.select(*out_cols)


def q_approx_topk_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy hitters over event users: top-20 user_ids
    by CMS estimate (4 x 256 md5-bucket grid). The md5 hash makes the
    whole sketch — every counter, every estimate, the never-
    underestimates invariant, and the top-k boundary — reproducible in
    DuckDB, so this sketch query is fully hash-checked."""
    ev = load_table(spark, sf_dir, "events")
    return cms_heavy_hitters(ev, "user_id", depth=4, width=256, k=20)


QUERIES = {
    "distinct_users_by_type": q_distinct_users_by_type,
    "approx_topk_cms": q_approx_topk_cms,
    "salted_event_stats": q_salted_event_stats,
    "value_trend_ols": q_value_trend_ols,
    "approx_distinct_users": q_approx_distinct_users,
    "hll_user_rollup": q_hll_user_rollup,
    "approx_value_quantiles": q_approx_value_quantiles,
}

ORACLE = {
    # approx_topk_cms: the sketch rebuilt bucket-for-bucket — bucket r
    # of a key = first 8 md5 hex chars of "r:key" mod 256, identical
    # integer on both engines (Spark conv(,16,10) == DuckDB 0x-cast)
    "approx_topk_cms": """
WITH per_key AS (
  SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id
),
rws AS (
  SELECT user_id, n, r.r FROM per_key, (SELECT unnest(range(4)) AS r) r
),
b AS (
  SELECT user_id, n, r,
         (('0x' || substr(md5(r::VARCHAR || ':' || user_id::VARCHAR), 1, 8))::BIGINT) % 256 AS bucket
  FROM rws
),
sketch AS (SELECT r, bucket, SUM(n) AS c FROM b GROUP BY r, bucket),
est AS (
  SELECT b.user_id, b.n, MIN(s.c) AS est
  FROM b JOIN sketch s ON s.r = b.r AND s.bucket = b.bucket
  GROUP BY b.user_id, b.n
)
SELECT user_id,
       CAST(est AS BIGINT) AS cms_estimate,
       CAST(n AS BIGINT) AS n_exact,
       est >= n AS never_underestimates
FROM est
ORDER BY est DESC, user_id
LIMIT 20
""",
    "distinct_users_by_type": """
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY event_type
""",
    "salted_event_stats": """
SELECT event_type, count(*) AS n_events,
       round(sum(value), 2) AS sum_value,
       round(min(value), 6) AS min_value,
       round(max(value), 6) AS max_value
FROM events GROUP BY event_type
""",
    "value_trend_ols": """
WITH s AS (
  SELECT l_returnflag AS flag, CAST(count(*) AS DOUBLE) AS n,
         round(sum(l_quantity), 2) AS sx,
         round(sum(l_extendedprice), 2) AS sy,
         round(sum(l_quantity * l_quantity), 2) AS sxx,
         round(sum(l_quantity * l_extendedprice), 2) AS sxy
  FROM lineitem GROUP BY l_returnflag
), sl AS (
  SELECT *, round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope
  FROM s
), it AS (
  SELECT *, round((sy - slope * sx) / n, 6) AS intercept FROM sl
)
SELECT flag, CAST(n AS BIGINT) AS n, slope, intercept,
       round(intercept + slope * 50, 6) AS forecast_at_50
FROM it
""",
    # Sketch-tier oracles assert the CLAIM, not the estimate: DuckDB
    # computes the exact side and literal TRUE for each bound; a Spark
    # sketch outside its bound emits false and fails the value hash.
    "approx_distinct_users": """
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
       TRUE AS within_bound
FROM events GROUP BY event_type
""",
    "hll_user_rollup": """
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
       TRUE AS within_bound,
       TRUE AS union_matches_single_shot
FROM events GROUP BY event_type
""",
    "approx_value_quantiles": """
SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
       TRUE AS p50_in_bound, TRUE AS p90_in_bound, TRUE AS p99_in_bound
FROM events GROUP BY event_type
""",
}


# ---- streaming CMS top-k through the driver gate -----------------------

_TOPK_REPLAY_SINKS: dict[tuple, str] = {}


def q_topk_stream_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CMS heavy-hitter sketch executed through the STREAMING lane:
    events replayed as a file stream, each micro-batch persisting grid
    partials to the log-structured store (`streaming/topk_stream.py`),
    the resolve summing them — bit-identical to the batch sketch, so
    the result hash-matches the SAME DuckDB CMS oracle. Third streaming
    driver gate: covers the foreachBatch + mergeable-store family
    (candle replay = keyed state, as-of replay = two-stream state).
    Building this query RUNS the stream (laziness-guard exempt)."""
    import os
    import shutil
    import tempfile
    import time as _time

    from data_timeseries_java_spark.streaming.replay import (
        drive_query,
        write_replay_buckets,
    )
    from data_timeseries_java_spark.streaming.topk_stream import (
        read_streaming_topk,
        streaming_cms_topk,
    )

    cache_key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir))
    work = _TOPK_REPLAY_SINKS.get(cache_key)
    if work is None or not os.path.isdir(f"{work}/out/topk"):
        ev = load_table(spark, sf_dir, "events")
        t0_ms, t1_ms = ev.select(
            F.min(F.unix_millis("ts")), F.max(F.unix_millis("ts"))).first()
        work = tempfile.mkdtemp(prefix="topk_stream_replay_")
        write_replay_buckets(ev, "ts", f"{work}/in", 4, t0_ms,
                             t1_ms - t0_ms + 1, _time.time() - 1000,
                             ["event_id"])
        src = (spark.readStream.schema(ev.schema)
               .option("maxFilesPerTrigger", 1).parquet(f"{work}/in/f*"))
        q = streaming_cms_topk(spark, src, f"{work}/out",
                               key_col="user_id",
                               candidates_per_batch=None)
        drive_query(q, 600, "topk stream replay")
        shutil.rmtree(f"{work}/in", ignore_errors=True)
        shutil.rmtree(f"{work}/out/checkpoint", ignore_errors=True)
        _TOPK_REPLAY_SINKS[cache_key] = work
    return read_streaming_topk(spark, f"{work}/out", k=20)


QUERIES["topk_stream_replay"] = q_topk_stream_replay

# the stream-produced sketch must hash-match the batch CMS oracle
# (string key + string tie-break, matching the streaming operator)
ORACLE["topk_stream_replay"] = """
WITH per_key AS (
  SELECT user_id::VARCHAR AS key, COUNT(*) AS n FROM events GROUP BY user_id
),
rws AS (
  SELECT key, n, r.r FROM per_key, (SELECT unnest(range(4)) AS r) r
),
b AS (
  SELECT key, n, r,
         (('0x' || substr(md5(r::VARCHAR || ':' || key), 1, 8))::BIGINT) % 256 AS bucket
  FROM rws
),
sketch AS (SELECT r, bucket, SUM(n) AS c FROM b GROUP BY r, bucket),
est AS (
  SELECT b.key, MIN(s.c) AS est
  FROM b JOIN sketch s ON s.r = b.r AND s.bucket = b.bucket
  GROUP BY b.key
)
SELECT key, CAST(est AS BIGINT) AS cms_estimate
FROM est
ORDER BY est DESC, key
LIMIT 20
"""


# ---- streaming HLL distinct through the driver gate --------------------

_HLL_REPLAY_SINKS: dict[tuple, str] = {}


def q_hll_stream_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming HLL distinct counting through the driver gate: events
    replayed as a file stream, one DataSketches HLL persisted per
    (batch, type), read-time register max-merge. Emitted as VERIFIABLE
    CLAIMS (the hll_user_rollup pattern): the merged estimate is within
    the sketch's error bound of exact, and EQUALS the single-shot
    whole-table sketch (lossless merge). Building RUNS the stream."""
    import os
    import shutil
    import tempfile
    import time as _time

    from data_timeseries_java_spark.streaming.hll_stream import (
        read_streaming_hll,
        streaming_hll_distinct,
    )
    from data_timeseries_java_spark.streaming.replay import (
        drive_query,
        write_replay_buckets,
    )

    cache_key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir))
    work = _HLL_REPLAY_SINKS.get(cache_key)
    if work is None or not os.path.isdir(f"{work}/out/hll"):
        ev = load_table(spark, sf_dir, "events")
        t0_ms, t1_ms = ev.select(
            F.min(F.unix_millis("ts")), F.max(F.unix_millis("ts"))).first()
        work = tempfile.mkdtemp(prefix="hll_stream_replay_")
        write_replay_buckets(ev, "ts", f"{work}/in", 4, t0_ms,
                             t1_ms - t0_ms + 1, _time.time() - 1000,
                             ["event_id"])
        src = (spark.readStream.schema(ev.schema)
               .option("maxFilesPerTrigger", 1).parquet(f"{work}/in/f*"))
        q = streaming_hll_distinct(spark, src, f"{work}/out")
        drive_query(q, 600, "hll stream replay")
        shutil.rmtree(f"{work}/in", ignore_errors=True)
        shutil.rmtree(f"{work}/out/checkpoint", ignore_errors=True)
        _HLL_REPLAY_SINKS[cache_key] = work
    merged = read_streaming_hll(spark, f"{work}/out")
    ev = load_table(spark, sf_dir, "events")
    single = ev.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id"))
        .alias("single_est"),
        F.count_distinct("user_id").alias("n_exact"))
    j = merged.join(F.broadcast(single), "event_type")
    within = (F.abs(F.col("distinct_est") - F.col("n_exact"))
              <= F.col("n_exact") * F.lit(HLL_REL_ERR))
    return j.select(
        "event_type",
        F.col("n_exact").cast("long").alias("n_exact"),
        within.alias("within_bound"),
        (F.col("distinct_est") == F.col("single_est"))
        .alias("merge_matches_single_shot"))


QUERIES["hll_stream_replay"] = q_hll_stream_replay

# claim-check oracle: exact distinct + both claims TRUE (the hash
# certifies the stream-merged sketch hit the bound and merged lossless)
ORACLE["hll_stream_replay"] = """
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
       TRUE AS within_bound,
       TRUE AS merge_matches_single_shot
FROM events GROUP BY event_type
"""


# ---- streaming grid-histogram quantiles, driver-gated through replay ----

_GRIDQ_REPLAY_SINKS: dict[tuple, str] = {}

_GRIDQ_LO, _GRIDQ_HI, _GRIDQ_BINS = 0.0, 256.0, 256
_GRIDQ_QS = (0.5, 0.9, 0.99)


def q_gridq_stream_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type quantiles through the STREAMING mergeable
    grid-histogram sketch (`streaming/quantile_stream.py`): each
    micro-batch appends fixed-grid bin counts; counts sum, so the
    merged grid equals the single-shot histogram, and the resolve
    (smallest bin whose cumulative count reaches q x total, estimate =
    bin midpoint) hash-matches a DuckDB oracle that re-derives the
    SAME grid from the raw events — the quantile sibling of the CMS
    and HLL store gates, completing the streaming sketch family.
    Building this query RUNS the stream (laziness-guard exempt)."""
    import os
    import shutil
    import tempfile
    import time as _time

    from data_timeseries_java_spark.streaming.quantile_stream import (
        read_streaming_quantiles,
        streaming_grid_quantiles,
    )
    from data_timeseries_java_spark.streaming.replay import (
        drive_query,
        write_replay_buckets,
    )

    cache_key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir))
    work = _GRIDQ_REPLAY_SINKS.get(cache_key)
    if work is None or not os.path.isdir(f"{work}/out/gridq"):
        ev = load_table(spark, sf_dir, "events")
        t0_ms, t1_ms = ev.select(
            F.min(F.unix_millis("ts")), F.max(F.unix_millis("ts"))).first()
        work = tempfile.mkdtemp(prefix="gridq_stream_replay_")
        write_replay_buckets(ev, "ts", f"{work}/in", 4, t0_ms,
                             t1_ms - t0_ms + 1, _time.time() - 1000,
                             ["event_id"])
        src = (spark.readStream.schema(ev.schema)
               .option("maxFilesPerTrigger", 1).parquet(f"{work}/in/f*"))
        q = streaming_grid_quantiles(spark, src, f"{work}/out",
                                     lo=_GRIDQ_LO, hi=_GRIDQ_HI,
                                     n_bins=_GRIDQ_BINS)
        drive_query(q, 600, "grid quantile stream replay")
        shutil.rmtree(f"{work}/in", ignore_errors=True)
        shutil.rmtree(f"{work}/out/checkpoint", ignore_errors=True)
        _GRIDQ_REPLAY_SINKS[cache_key] = work
    r = read_streaming_quantiles(spark, f"{work}/out", qs=_GRIDQ_QS)
    return r.select(F.col("grp").alias("event_type"), "q", "n", "estimate")


QUERIES["gridq_stream_replay"] = q_gridq_stream_replay

ORACLE["gridq_stream_replay"] = f"""
WITH b AS (
  SELECT event_type,
         least({_GRIDQ_BINS - 1}, greatest(0,
             CAST(floor((value - {_GRIDQ_LO}) * {_GRIDQ_BINS}
                        / ({_GRIDQ_HI} - {_GRIDQ_LO})) AS INT))) AS bin
  FROM events
),
g AS (SELECT event_type, bin, count(*) AS c FROM b GROUP BY 1, 2),
t AS (SELECT event_type, sum(c) AS total FROM g GROUP BY 1),
cum AS (
  SELECT event_type, bin,
         sum(c) OVER (PARTITION BY event_type ORDER BY bin
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cc
  FROM g
),
qs(q) AS (VALUES (0.5), (0.9), (0.99)),
sel AS (
  SELECT c.event_type, q.q, min(c.bin) AS bin
  FROM cum c
  JOIN t ON t.event_type = c.event_type
  CROSS JOIN qs q
  WHERE c.cc >= q.q * t.total
  GROUP BY c.event_type, q.q
)
SELECT s.event_type, s.q, CAST(t.total AS BIGINT) AS n,
       round({_GRIDQ_LO} + (s.bin + 0.5)
             * (({_GRIDQ_HI} - {_GRIDQ_LO}) / {_GRIDQ_BINS}), 6)
         AS estimate
FROM sel s JOIN t ON t.event_type = s.event_type
"""


# ---- HLL set-intersection via inclusion-exclusion ------------------------


def q_hll_pair_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-user OVERLAP between every pair of event types from the
    per-type HLL sketches alone — inclusion-exclusion on mergeable
    sketches (|A∩B| ~ est(A) + est(B) - est(A∪B)), the audience-overlap
    question a 100 TB store answers WITHOUT rescanning: per-type
    sketches persist, every pairwise union is sketch-sized work on a
    frame of #types rows. Emitted as VERIFIABLE CLAIMS (module
    convention): the exact pair intersection plus a boolean that the
    sketch estimate lands within HLL_REL_ERR of the UNION scale
    (n_a + n_b — inclusion-exclusion compounds three estimates, so the
    bound is on the inputs' scale, not the possibly-tiny overlap).

    The pair enumeration is a non-equi self-join of the #types-row
    sketch frame (tiny, broadcast); the exact side distincts (type,
    user) once, self-joins on user within the pair order, and
    aggregates — one shuffle each."""
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count_distinct("user_id").alias("n"))
    a = per_type.select(F.col("event_type").alias("type_a"),
                        F.col("sk").alias("sk_a"), F.col("n").alias("n_a"))
    b = per_type.select(F.col("event_type").alias("type_b"),
                        F.col("sk").alias("sk_b"), F.col("n").alias("n_b"))
    pairs = a.join(F.broadcast(b), F.col("type_a") < F.col("type_b"))
    est_inter = (F.hll_sketch_estimate("sk_a")
                 + F.hll_sketch_estimate("sk_b")
                 - F.hll_sketch_estimate(F.hll_union("sk_a", "sk_b")))
    du = ev.select("event_type", "user_id").distinct()
    xa = du.select(F.col("event_type").alias("type_a"),
                   F.col("user_id").alias("u"))
    xb = du.select(F.col("event_type").alias("type_b"),
                   F.col("user_id").alias("u"))
    inter = (xa.join(xb, "u")
             .where(F.col("type_a") < F.col("type_b"))
             .groupBy("type_a", "type_b")
             .agg(F.count(F.lit(1)).alias("exact_inter")))
    j = pairs.join(F.broadcast(inter), ["type_a", "type_b"], "left")
    exact = F.coalesce(F.col("exact_inter"), F.lit(0))
    within = (F.abs(est_inter - exact)
              <= (F.col("n_a") + F.col("n_b")) * F.lit(HLL_REL_ERR))
    return j.select("type_a", "type_b",
                    exact.cast("long").alias("exact_inter"),
                    within.alias("within_bound"))


QUERIES["hll_pair_intersection"] = q_hll_pair_intersection

ORACLE["hll_pair_intersection"] = """
WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
types AS (SELECT DISTINCT event_type FROM events),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b
  FROM types a JOIN types b ON a.event_type < b.event_type
),
inter AS (
  SELECT xa.event_type AS type_a, xb.event_type AS type_b,
         count(*) AS exact_inter
  FROM du xa JOIN du xb ON xa.user_id = xb.user_id
  WHERE xa.event_type < xb.event_type
  GROUP BY xa.event_type, xb.event_type
)
SELECT p.type_a, p.type_b,
       CAST(coalesce(i.exact_inter, 0) AS BIGINT) AS exact_inter,
       TRUE AS within_bound
FROM pairs p
LEFT JOIN inter i ON i.type_a = p.type_a AND i.type_b = p.type_b
"""
