"""Skew-resilient aggregation + sketch tier: semantics vs the naive
plans, error bounds for the HLL estimates, and the plan shapes that
make the rewrites worth having."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_timeseries_java_spark.plans import exchange_count, has_python_eval
from data_timeseries_java_spark.queries import all_queries
from data_timeseries_java_spark.tables import load_table


def test_two_phase_distinct_matches_naive(spark, sf_dir):
    got = all_queries()["distinct_users_by_type"](spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    naive = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_users"))
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, naive.collect()))


def test_salted_agg_matches_unsalted(spark, sf_dir):
    got = all_queries()["salted_event_stats"](spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    naive = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.round(F.min("value"), 6).alias("min_value"),
        F.round(F.max("value"), 6).alias("max_value"))
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, naive.collect()))


def test_two_phase_shapes(spark, sf_dir):
    """Both rewrites are exactly two aggregation exchanges over the
    scan — the salt/pair split must not introduce extra shuffles —
    and stay JVM-side."""
    for name in ("distinct_users_by_type", "salted_event_stats"):
        q = all_queries()[name](spark, sf_dir)
        assert exchange_count(q) <= 2, name
        assert not has_python_eval(q), name


def test_approx_distinct_within_rsd(spark, sf_dir):
    """HLL++ at rsd=2%: raw estimates must land within 3*rsd of exact,
    and the declared query's verifiable claim must therefore hold."""
    ev = load_table(spark, sf_dir, "events")
    raw = {r["event_type"]: (r["a"], r["n"])
           for r in ev.groupBy("event_type").agg(
               F.approx_count_distinct("user_id", 0.02).alias("a"),
               F.count_distinct("user_id").alias("n")).collect()}
    for t, (a, n) in raw.items():
        assert abs(a - n) <= max(1, 0.06 * n), (t, a, n)
    claims = all_queries()["approx_distinct_users"](spark, sf_dir).collect()
    assert len(claims) == len(raw)
    for r in claims:
        assert r["within_bound"], r
        assert r["n_exact"] == raw[r["event_type"]][1]


def test_hll_rollup_matches_single_shot(spark, sf_dir):
    """Union of daily DataSketches must estimate like (and near the
    exact value of) a single pass — the mergeability contract that
    makes incremental rollups sound."""
    ev = load_table(spark, sf_dir, "events")
    rolled = {r["event_type"]: r["n"]
              for r in ev.groupBy("event_type", F.to_date("ts").alias("d"))
              .agg(F.hll_sketch_agg("user_id").alias("sk"))
              .groupBy("event_type")
              .agg(F.hll_sketch_estimate(
                  F.hll_union_agg("sk")).alias("n")).collect()}
    single = {r["event_type"]: r["n"]
              for r in ev.groupBy("event_type")
              .agg(F.hll_sketch_estimate(
                  F.hll_sketch_agg("user_id")).alias("n")).collect()}
    exact = {r["event_type"]: r["n"]
             for r in ev.groupBy("event_type")
             .agg(F.count_distinct("user_id").alias("n")).collect()}
    for t in exact:
        assert rolled[t] == single[t], t
        assert abs(rolled[t] - exact[t]) <= max(2, 0.05 * exact[t]), t
    # and the declared query's claim columns must agree
    for r in all_queries()["hll_user_rollup"](spark, sf_dir).collect():
        assert r["within_bound"] and r["union_matches_single_shot"], r
        assert r["n_exact"] == exact[r["event_type"]]


def test_ols_slope_matches_builtin_regr(spark, sf_dir):
    """The rounded-sums closed form must agree with Spark's own
    regr_slope/regr_intercept to well beyond the 6-dp output grid."""
    got = {r["flag"]: (r["slope"], r["intercept"])
           for r in all_queries()["value_trend_ols"](
               spark, sf_dir).collect()}
    li = load_table(spark, sf_dir, "lineitem")
    ref = {r["flag"]: (r["s"], r["i"])
           for r in li.groupBy(F.col("l_returnflag").alias("flag")).agg(
               F.regr_slope("l_extendedprice", "l_quantity").alias("s"),
               F.regr_intercept("l_extendedprice", "l_quantity").alias("i"))
           .collect()}
    assert set(got) == set(ref)
    for flag, (s, i) in got.items():
        assert abs(s - ref[flag][0]) < 1e-4, flag
        assert abs(i - ref[flag][1]) < 1e-2, flag


def test_approx_quantiles_within_tolerance(spark, sf_dir):
    """GK sketch at accuracy 1000: each raw approximate percentile must
    sit within 1% rank error of the exact distribution (checked by value
    against exact percentiles one rank-point either side), and the
    declared query's rank-interval claims must all hold."""
    ev = load_table(spark, sf_dir, "events")
    raw = {r["event_type"]: r
           for r in ev.groupBy("event_type").agg(
               F.percentile_approx("value", F.array(
                   F.lit(0.5), F.lit(0.9), F.lit(0.99)),
                   F.lit(1000)).alias("pa")).collect()}
    exact = {r["event_type"]: r
             for r in ev.groupBy("event_type").agg(
                 F.expr("percentile(value, array(0.49, 0.51, 0.89, "
                        "0.91, 0.98, 1.0))").alias("p")).collect()}
    for t, r in raw.items():
        lo, hi = exact[t]["p"][0], exact[t]["p"][1]
        assert lo <= r["pa"][0] <= hi, (t, "p50")
        lo, hi = exact[t]["p"][2], exact[t]["p"][3]
        assert lo <= r["pa"][1] <= hi, (t, "p90")
        lo, hi = exact[t]["p"][4], exact[t]["p"][5]
        assert lo <= r["pa"][2] <= hi, (t, "p99")
    for r in all_queries()["approx_value_quantiles"](spark, sf_dir).collect():
        assert r["p50_in_bound"] and r["p90_in_bound"] and r["p99_in_bound"], r


def test_aqe_skew_join_splits_hot_key(spark):
    """SCALE.md's 'AQE skew-split handles hot windows' claim, executed:
    a join where one key carries ~50x the rows of every other must come
    back from AQE with the sort-merge join marked skew=true (the hot
    partition split across tasks), and the result must still match the
    closed-form oracle. forceOptimizeSkewedJoin is needed because the
    downstream aggregation's required distribution otherwise vetoes the
    extra shuffle the split introduces — the same setting a production
    job with skewed joins feeding aggs would run with."""
    conf = {
        # keep the join a shuffle join and make the tiny fixture's hot
        # partition cross AQE's (byte-based) skew thresholds
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
    }
    old = {}
    for k in conf:
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
    try:
        for k, v in conf.items():
            spark.conf.set(k, v)
        left = spark.range(100_000).select(
            F.when(F.col("id") % 2 == 0, F.lit("HOT")).otherwise(
                F.concat(F.lit("k"), (F.col("id") % 100).cast("string"))
            ).alias("key"),
            F.col("id").alias("v"))
        right = spark.range(2_000).select(
            F.when(F.col("id") % 4 == 0, F.lit("HOT")).otherwise(
                F.concat(F.lit("k"), (F.col("id") % 100).cast("string"))
            ).alias("key"),
            F.col("id").alias("w"))
        j = (left.join(right, "key")
             .groupBy("key").agg(F.count(F.lit(1)).alias("n")))
        rows = {r.key: r.n for r in j.collect()}
        final_plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final_plan, (
            "AQE did not split the skewed join:\n" + final_plan)
        # closed-form oracle: HOT = 50k left (even ids) x 500 right
        # (ids % 4 == 0). Cold keys live on both sides only for ODD
        # residues (left cold ids are odd; odd residues are never % 4
        # == 0): 50 keys, each 1000 left x 20 right.
        assert rows["HOT"] == 50_000 * 500
        cold = {k: n for k, n in rows.items() if k != "HOT"}
        assert len(cold) == 50
        assert all(n == 1000 * 20 for n in cold.values())
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
