"""Streaming CMS top-k vs the batch sketch on bounded input."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F


def _replay_files(spark, df, d, n_files, order_col):
    for i in range(n_files):
        (df.where(F.pmod(F.hash(order_col), n_files) == i).coalesce(1)
         .write.mode("overwrite").parquet(f"{d}/in/f{i}"))


def test_streaming_topk_matches_batch_sketch(spark, sf_dir):
    """With unbounded candidates the streaming resolve must equal the
    batch CMS exactly: grids are sums, candidates cover every key."""
    from data_timeseries_java_spark.operators.skew import cms_heavy_hitters
    from data_timeseries_java_spark.streaming import (
        read_streaming_topk,
        streaming_cms_topk,
    )
    from data_timeseries_java_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    d = tempfile.mkdtemp(prefix="stopk_")
    try:
        _replay_files(spark, ev, d, 4, "event_id")
        src = (spark.readStream.schema(ev.schema)
               .option("maxFilesPerTrigger", 1).parquet(f"{d}/in/f*"))
        q = streaming_cms_topk(spark, src, f"{d}/out",
                               key_col="user_id",
                               candidates_per_batch=None)
        assert q.awaitTermination(300)

        got = [(r.key, r.cms_estimate) for r in
               read_streaming_topk(spark, f"{d}/out", k=20).collect()]
        # batch tie-breaks on the native int key, streaming on its
        # string key — re-rank the batch result under the streaming
        # ordering ((-estimate, str key)) before the k-cut
        want = sorted(((str(r.user_id), r.cms_estimate) for r in
                       cms_heavy_hitters(ev, "user_id", k=1000).collect()),
                      key=lambda t: (-t[1], t[0]))[:20]
        assert got == want
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_topk_state_bounded_and_compacts(spark, sf_dir):
    """Bounded candidates: each batch persists at most depth*width grid
    rows + M candidate rows; compaction folds history to ONE partial
    and the resolved top-k is unchanged."""
    from data_timeseries_java_spark.streaming import (
        compact_topk_store,
        read_streaming_topk,
        streaming_cms_topk,
    )
    from data_timeseries_java_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    d = tempfile.mkdtemp(prefix="stopk_b_")
    try:
        _replay_files(spark, ev, d, 4, "event_id")
        src = (spark.readStream.schema(ev.schema)
               .option("maxFilesPerTrigger", 1).parquet(f"{d}/in/f*"))
        q = streaming_cms_topk(spark, src, f"{d}/out",
                               key_col="user_id",
                               candidates_per_batch=30)
        assert q.awaitTermination(300)

        store = f"{d}/out/topk"
        for b in os.listdir(store):
            if not b.startswith("batch_id="):
                continue
            rows = spark.read.parquet(f"{store}/{b}").count()
            assert rows <= 4 * 256 + 30
        before = [(r.key, r.cms_estimate) for r in
                  read_streaming_topk(spark, f"{d}/out", k=10).collect()]
        stats = compact_topk_store(spark, f"{d}/out")
        assert stats["batches_after"] == 1
        after = [(r.key, r.cms_estimate) for r in
                 read_streaming_topk(spark, f"{d}/out", k=10).collect()]
        assert after == before
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_topk_compaction_crash_and_resume_safe(spark, sf_dir):
    """The two compaction hazards stay closed:

    1. crash window — if the old batch dirs survive alongside the fold
       (process died between the fold rename and the rmtree loop), the
       resolve must EXCLUDE the superseded partitions instead of
       summing both (which would double every count);
    2. resumed-stream collision — a stream resuming from its retained
       checkpoint writes batch_id = max real id + 1; the fold must live
       at an id that write can never overwrite, and post-compaction
       batches must count IN ADDITION to the fold."""
    from data_timeseries_java_spark.streaming import (
        compact_topk_store,
        read_streaming_topk,
        streaming_cms_topk,
    )
    from data_timeseries_java_spark.streaming.topk_stream import _FOLD_OFFSET
    from data_timeseries_java_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    d = tempfile.mkdtemp(prefix="stopk_c_")
    try:
        _replay_files(spark, ev, d, 4, "event_id")
        src = (spark.readStream.schema(ev.schema)
               .option("maxFilesPerTrigger", 1).parquet(f"{d}/in/f*"))
        q = streaming_cms_topk(spark, src, f"{d}/out",
                               key_col="user_id",
                               candidates_per_batch=None)
        assert q.awaitTermination(300)
        store = f"{d}/out/topk"
        before = [(r.key, r.cms_estimate) for r in
                  read_streaming_topk(spark, f"{d}/out", k=10).collect()]

        # simulate the crash: run compaction, then RESTORE the original
        # batch dirs next to the fold (as if rmtree never ran)
        saved = tempfile.mkdtemp(prefix="stopk_saved_")
        originals = sorted(b for b in os.listdir(store)
                           if b.startswith("batch_id="))
        for b in originals:
            shutil.copytree(f"{store}/{b}", f"{saved}/{b}")
        compact_topk_store(spark, f"{d}/out")
        folds = [b for b in os.listdir(store) if b.startswith("batch_id=")]
        assert len(folds) == 1
        assert int(folds[0].split("=", 1)[1]) >= _FOLD_OFFSET
        for b in originals:
            shutil.copytree(f"{saved}/{b}", f"{store}/{b}")
        crashed = [(r.key, r.cms_estimate) for r in
                   read_streaming_topk(spark, f"{d}/out", k=10).collect()]
        assert crashed == before          # superseded partials excluded

        # compaction of the crashed store repairs it (carries the old
        # supersession rows forward, removes the leftovers)
        compact_topk_store(spark, f"{d}/out")
        repaired = [(r.key, r.cms_estimate) for r in
                    read_streaming_topk(spark, f"{d}/out", k=10).collect()]
        assert repaired == before

        # resumed stream: replay the SAME files against the retained
        # checkpoint — availableNow already consumed them, so simulate
        # the resume by writing a post-compaction batch at the id the
        # checkpoint counter would use (max real id + 1 = 4); it must
        # not collide with the fold and must ADD to the totals
        shutil.copytree(f"{saved}/{originals[0]}", f"{store}/batch_id=4")
        doubled_first = read_streaming_topk(spark, f"{d}/out", k=10)
        est = {r.key: r.cms_estimate for r in doubled_first.collect()}
        base = dict(before)
        assert any(est[k] > base[k] for k in est if k in base)
        shutil.rmtree(saved, ignore_errors=True)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_hll_matches_single_shot(spark, sf_dir):
    """Register max-merge is lossless: the union of per-batch HLL
    sketches must give EXACTLY the single-shot batch sketch's estimate
    per group, and sit within the sketch's error bound of exact."""
    from data_timeseries_java_spark.streaming import (
        read_streaming_hll,
        streaming_hll_distinct,
    )
    from data_timeseries_java_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    d = tempfile.mkdtemp(prefix="shll_")
    try:
        _replay_files(spark, ev, d, 4, "event_id")
        src = (spark.readStream.schema(ev.schema)
               .option("maxFilesPerTrigger", 1).parquet(f"{d}/in/f*"))
        q = streaming_hll_distinct(spark, src, f"{d}/out")
        assert q.awaitTermination(300)

        got = {r.event_type: r.distinct_est for r in
               read_streaming_hll(spark, f"{d}/out").collect()}
        single = {r.event_type: (r.est, r.n_exact) for r in
                  ev.groupBy("event_type").agg(
                      F.hll_sketch_estimate(
                          F.hll_sketch_agg("user_id")).alias("est"),
                      F.count_distinct("user_id").alias("n_exact"))
                  .collect()}
        assert set(got) == set(single)
        for t, est in got.items():
            assert est == single[t][0]            # lossless merge
            assert abs(est - single[t][1]) <= max(2, single[t][1] * 0.05)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_grid_quantiles_accuracy_and_merge(spark, sf_dir):
    """The merged grid must equal the single-shot histogram (counts
    sum), and every quantile estimate must sit within one bin width of
    the exact quantile."""
    from data_timeseries_java_spark.streaming.quantile_stream import (
        read_streaming_quantiles,
        streaming_grid_quantiles,
    )
    from data_timeseries_java_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    d = tempfile.mkdtemp(prefix="sgq_")
    try:
        _replay_files(spark, ev, d, 4, "event_id")
        src = (spark.readStream.schema(ev.schema)
               .option("maxFilesPerTrigger", 1).parquet(f"{d}/in/f*"))
        q = streaming_grid_quantiles(spark, src, f"{d}/out",
                                     lo=0.0, hi=256.0, n_bins=256)
        assert q.awaitTermination(300)
        got = {(r.grp, r.q): r.estimate for r in
               read_streaming_quantiles(spark, f"{d}/out",
                                        qs=[0.5, 0.9]).collect()}
        # the provable bound: the selected bin CONTAINS the discrete
        # order statistic x_(ceil(q*n)) (cumulative count crosses q*n
        # inside it), so |midpoint - x| <= width/2. The INTERPOLATED
        # percentile has no such bound on sparse regions.
        import math
        vals = {}
        for r in ev.select("event_type", "value").collect():
            vals.setdefault(r.event_type, []).append(r.value)
        width = 1.0                      # (256 - 0) / 256
        for (grp, qq), est in got.items():
            xs = sorted(vals[grp])
            x = xs[max(0, math.ceil(qq * len(xs)) - 1)]
            assert abs(est - x) <= width / 2, (grp, qq, est, x)
        # geometry guard: wrong reader geometry must refuse
        import pytest
        with pytest.raises(ValueError, match="written with"):
            read_streaming_quantiles(spark, f"{d}/out", n_bins=128)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_gridq_compaction_crash_safe(spark, sf_dir):
    """Grid-quantile store compaction inherits the top-k compactor's
    crash safety (shared streaming/logstore.py mechanics): resolve is
    unchanged after compaction, excludes superseded leftovers after a
    simulated crash, and a second compaction repairs the store."""
    from data_timeseries_java_spark.streaming.logstore import FOLD_OFFSET
    from data_timeseries_java_spark.streaming.quantile_stream import (
        compact_gridq_store,
        read_streaming_quantiles,
        streaming_grid_quantiles,
    )
    from data_timeseries_java_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    d = tempfile.mkdtemp(prefix="sgq_c_")
    try:
        _replay_files(spark, ev, d, 4, "event_id")
        src = (spark.readStream.schema(ev.schema)
               .option("maxFilesPerTrigger", 1).parquet(f"{d}/in/f*"))
        q = streaming_grid_quantiles(spark, src, f"{d}/out")
        assert q.awaitTermination(300)
        store = f"{d}/out/gridq"
        snap = lambda: sorted(  # noqa: E731
            (r.grp, r.q, r.n, r.estimate) for r in
            read_streaming_quantiles(spark, f"{d}/out").collect())
        before = snap()

        saved = tempfile.mkdtemp(prefix="sgq_saved_")
        originals = sorted(b for b in os.listdir(store)
                           if b.startswith("batch_id="))
        for b in originals:
            shutil.copytree(f"{store}/{b}", f"{saved}/{b}")
        stats = compact_gridq_store(spark, f"{d}/out")
        assert stats["batches_after"] == 1
        folds = [b for b in os.listdir(store) if b.startswith("batch_id=")]
        assert int(folds[0].split("=", 1)[1]) >= FOLD_OFFSET
        assert snap() == before           # compaction preserves resolve
        for b in originals:               # simulated crash leftovers
            shutil.copytree(f"{saved}/{b}", f"{store}/{b}")
        assert snap() == before           # superseded partials excluded
        compact_gridq_store(spark, f"{d}/out")
        assert snap() == before           # repair pass
        shutil.rmtree(saved, ignore_errors=True)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_topk_compaction_racing_live_batch_is_excluded(spark, sf_dir,
                                                       monkeypatch):
    """The concurrent-writer hazard, exercised rather than asserted: a
    live micro-batch that lands AFTER compaction snapshots the batch
    list but BEFORE the fold swaps in must be (a) left on disk, (b)
    absent from the fold's supersession set, and (c) counted IN
    ADDITION to the fold — the _FOLD_OFFSET id-space claim says the
    racer's id can never collide with or be claimed by the fold. A
    follow-up quiesced compaction then folds the racer in with totals
    unchanged."""
    import data_timeseries_java_spark.streaming.topk_stream as ts
    from data_timeseries_java_spark.streaming import (
        compact_topk_store,
        read_streaming_topk,
        streaming_cms_topk,
    )
    from data_timeseries_java_spark.streaming.topk_stream import (
        _FOLD_OFFSET,
        _superseded_ids,
    )
    from data_timeseries_java_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    d = tempfile.mkdtemp(prefix="stopk_r_")
    try:
        _replay_files(spark, ev, d, 4, "event_id")
        src = (spark.readStream.schema(ev.schema)
               .option("maxFilesPerTrigger", 1).parquet(f"{d}/in/f*"))
        q = streaming_cms_topk(spark, src, f"{d}/out",
                               key_col="user_id",
                               candidates_per_batch=None)
        assert q.awaitTermination(300)
        store = f"{d}/out/topk"
        originals = sorted(b for b in os.listdir(store)
                           if b.startswith("batch_id="))

        # expected totals = originals + the racing batch (a replayed
        # copy of batch 0), resolved on an UNCOMPACTED store
        racer_src = tempfile.mkdtemp(prefix="stopk_racer_")
        shutil.copytree(f"{store}/{originals[0]}",
                        f"{racer_src}/batch", dirs_exist_ok=True)
        shutil.copytree(f"{racer_src}/batch", f"{store}/batch_id=4")
        want = [(r.key, r.cms_estimate) for r in
                read_streaming_topk(spark, f"{d}/out", k=10).collect()]
        shutil.rmtree(f"{store}/batch_id=4")

        # deterministic interleave: the racer lands between the batch
        # listing and the fold swap — exactly the window a live
        # micro-batch can hit
        real_swap = ts.swap_in_fold

        def racing_swap(folded, store_path, new_id, old_dirs):
            shutil.copytree(f"{racer_src}/batch",
                            f"{store_path}/batch_id=4")
            real_swap(folded, store_path, new_id, old_dirs)

        monkeypatch.setattr(ts, "swap_in_fold", racing_swap)
        compact_topk_store(spark, f"{d}/out")
        monkeypatch.setattr(ts, "swap_in_fold", real_swap)

        dirs = sorted(b for b in os.listdir(store)
                      if b.startswith("batch_id="))
        assert f"batch_id=4" in dirs                      # racer survives
        fold_ids = [int(b.split("=", 1)[1]) for b in dirs
                    if int(b.split("=", 1)[1]) >= _FOLD_OFFSET]
        assert len(fold_ids) == 1                         # one fold
        sup = _superseded_ids(
            spark.read.option("basePath", store).parquet(store))
        assert 4 not in sup                               # racer not claimed
        got = [(r.key, r.cms_estimate) for r in
               read_streaming_topk(spark, f"{d}/out", k=10).collect()]
        assert got == want                                # racer counted once

        # quiesced follow-up compaction folds the racer in, totals fixed
        stats = compact_topk_store(spark, f"{d}/out")
        assert stats["batches_after"] == 1
        again = [(r.key, r.cms_estimate) for r in
                 read_streaming_topk(spark, f"{d}/out", k=10).collect()]
        assert again == want
        shutil.rmtree(racer_src, ignore_errors=True)
    finally:
        shutil.rmtree(d, ignore_errors=True)
