"""Property tier: randomized tick streams through the candle pipeline,
invariants asserted (SURVEY.md §5). Also pins the corrected bid/bid
semantics (SURVEY.md §2.9.1) with bid != ask data, which the demo
fixtures deliberately cannot distinguish."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from data_timeseries_java_spark.operators import (
    complete_candles,
    gap_fill,
    ohlc_candles,
)
from data_timeseries_java_spark.operators.candles import candles_pipeline
from data_timeseries_java_spark.schemas import TICK_SCHEMA

T0 = 1_699_999_920_000  # epoch anchor aligned to the 120 s window grid


def _ts(ms):
    return datetime.fromtimestamp(ms / 1000.0, tz=timezone.utc)


def test_bid_minmax_uses_bid_not_ask(spark):
    """Reference bug §2.9.1: its bid min/max compare ASK prices. Our
    engine compares bid with bid — asserted with bid != ask ticks where
    the two orderings disagree."""
    rows = [
        # bid order: 5 < 7 < 9 ; ask order REVERSED: 30 > 20 > 10
        ("K", _ts(T0 + 0), 5.0, 30.0, True),
        ("K", _ts(T0 + 60_000), 7.0, 20.0, True),
        ("K", _ts(T0 + 119_000), 9.0, 10.0, True),
    ]
    df = spark.createDataFrame(rows, TICK_SCHEMA)
    c = ohlc_candles(df, "120 seconds").collect()[0]
    assert c.min_bid.bid == 5.0 and c.max_bid.bid == 9.0   # ours: bid/bid
    assert c.min_ask.ask == 10.0 and c.max_ask.ask == 30.0
    # the reference would have returned min_bid = the min-ASK tick (bid 9)


tick_lists = st.lists(
    st.tuples(
        st.sampled_from(["A", "B", "C"]),                      # key
        st.integers(min_value=0, max_value=20),                # minute
        st.floats(min_value=0.01, max_value=1000.0,
                  allow_nan=False, allow_infinity=False),      # bid
        st.floats(min_value=0.01, max_value=1000.0,
                  allow_nan=False, allow_infinity=False),      # ask
    ),
    min_size=1, max_size=40,
)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(ticks=tick_lists)
def test_candle_invariants_random_streams(spark, ticks):
    rows = [(k, _ts(T0 + m * 60_000), bid, ask, True)
            for (k, m, bid, ask) in ticks]
    df = spark.createDataFrame(rows, TICK_SCHEMA)
    instruments = df.select("key").distinct()
    candles = candles_pipeline(df, instruments, "120 seconds").collect()

    by_key: dict[str, list] = {}
    for c in candles:
        by_key.setdefault(c.key, []).append(c)
    for key, cs in by_key.items():
        cs.sort(key=lambda c: c.window_start)
        prev = None
        for c in cs:
            if c.is_live:
                # bounds: min <= close <= max per side
                assert c.min_ask.ask <= c.close.ask <= c.max_ask.ask
                assert c.min_bid.bid <= c.close.bid <= c.max_bid.bid
            else:
                # gap candles are flat at the carried close
                assert (c.min_ask.ask == c.max_ask.ask == c.close.ask)
                assert not c.close.is_live
            if prev is not None:
                # carry-forward: open == previous close (price & time)
                assert c.open.ask == prev.close.ask
                assert c.open.bid == prev.close.bid
                assert c.open.time == prev.close.time
            else:
                assert c.open == c.close or c.open.time == c.close.time
            prev = c

    # every (observed window x key) is covered after gap fill
    n_windows = len({(c.window_start) for c in candles})
    assert all(len(cs) == n_windows for cs in by_key.values())


# ---------------------------------------------------------------- codecs

@given(st.integers(0, 255), st.integers(1, 40), st.integers(1, 40))
@settings(max_examples=40, deadline=None)
def test_jpeg_constant_gray_exact_any_dims(v, w, h):
    """Every constant gray value at every dimension round-trips
    bit-exact at quality 75 (the media_jpeg_decode oracle contract —
    padding, Huffman, DCT and un-padding all on the path)."""
    import numpy as np

    from data_timeseries_java_spark.functions.jpeg import (
        decode_jpeg, encode_jpeg)

    img = np.full((h, w), v, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, 75))
    assert out.shape == (h, w, 1) and bool(np.all(out[..., 0] == v))


@given(st.lists(st.integers(-32768, 32767), min_size=1, max_size=400),
       st.integers(1, 4), st.sampled_from([8000, 16000, 44100]))
@settings(max_examples=40, deadline=None)
def test_wav_roundtrip_exact_any_pcm(vals, ch, rate):
    """Arbitrary int16 PCM round-trips bit-exact through the WAV codec
    at any channel count / sample rate."""
    import numpy as np

    from data_timeseries_java_spark.functions.wav import (
        decode_wav, encode_wav)

    n = len(vals) - len(vals) % ch
    if n == 0:
        n, vals = ch, (vals * ch)[:ch]
    arr = np.array(vals[:n], dtype=np.int16).reshape(-1, ch)
    out, got_rate = decode_wav(encode_wav(arr, rate))
    assert got_rate == rate and np.array_equal(out, arr)


@given(st.lists(st.integers(0, 255), min_size=1, max_size=6),
       st.integers(1, 16), st.integers(1, 16))
@settings(max_examples=25, deadline=None)
def test_avi_demux_returns_frames_verbatim(frame_vals, w, h):
    """The AVI container returns every MJPEG frame byte-for-byte, in
    order, for any frame count and dimensions."""
    import numpy as np

    from data_timeseries_java_spark.functions.avi import (
        decode_avi_frames, encode_avi_mjpeg)
    from data_timeseries_java_spark.functions.jpeg import encode_jpeg

    frames = [encode_jpeg(np.full((h, w), v, np.uint8), 75)
              for v in frame_vals]
    avi = encode_avi_mjpeg(frames, w, h)
    assert decode_avi_frames(avi) == frames


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.integers(min_value=0, max_value=30),
                min_size=8, max_size=60))
def test_winnowing_invariants_random_docs(spark, word_ids):
    """Structural invariants of winnowing on random token streams:
    every fingerprint is one of the doc's k-gram hashes at a valid
    position, and every complete window of w consecutive grams contains
    at least one selected position (the covering property that makes
    the density ~2/(w+1))."""
    from data_timeseries_java_spark.operators.text import (
        winnowing_fingerprints,
    )

    k, w = 3, 4
    text = " ".join(f"w{i}" for i in word_ids)
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = winnowing_fingerprints(docs, k=k, w=w).collect()[0]
    n_grams = len(word_ids) - k + 1
    assert row.n_grams == n_grams
    if n_grams >= w:
        # density bound: selections can't exceed one per window START
        # and must cover every window (>= ceil(n_windows / w) picks)
        n_windows = n_grams - w + 1
        assert 1 <= row.n_fingerprints <= n_windows
        assert row.n_fingerprints >= (n_windows + w - 1) // w
    else:
        assert row.n_fingerprints == 0


@given(st.lists(
    st.text(alphabet="abcdet aa01~.!", min_size=0, max_size=60),
    min_size=1, max_size=8))
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_bpe_replace_chain_equals_classic_on_random_text(spark, texts):
    """Property: the separator-string replace-chain BPE apply equals
    the classic per-word sequential merge algorithm on arbitrary text —
    including repeated characters (overlapping-merge stress like
    'aaaa'), separator characters in the input (stripped by the word
    regex), empty strings, and punctuation."""
    import re

    from data_timeseries_java_spark.functions.bpe_vocab import MERGES
    from data_timeseries_java_spark.operators.text import bpe_token_counts

    def classic(text):
        words = re.findall(r"[a-z0-9]+", text.lower())
        total = 0
        for w in words:
            toks = list(w)
            for a, b in MERGES:
                out, i = [], 0
                while i < len(toks):
                    if i + 1 < len(toks) and toks[i] == a \
                            and toks[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(toks[i])
                        i += 1
                toks = out
            total += len(toks)
        return len(words), sum(len(w) for w in words), total

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = {r.doc_id: (r.n_words, r.n_chars, r.n_bpe_tokens)
           for r in bpe_token_counts(df).collect()}
    for i, t in enumerate(texts):
        assert got[i] == classic(t), (t, got[i], classic(t))


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(ticks=tick_lists)
def test_bar_trilogy_invariants_random_streams(spark, ticks):
    """Event-driven bars on randomized streams: every bar type
    conserves the tick count exactly; tick bars hold ceil(n/size) bars
    per key with only the last partial; dollar bars never exceed the
    threshold by more than one tick's value; imbalance bars close at
    exactly |threshold| (±1 steps) except the final partial. These
    hold under ANY tie order, so duplicate timestamps in the strategy
    are fine."""
    import math as _math

    from data_timeseries_java_spark.operators.bars import (
        dollar_bars,
        imbalance_bars,
        tick_bars,
    )

    rows = [(k, _ts(T0 + m * 60_000), bid, ask, True)
            for (k, m, bid, ask) in ticks]
    df = spark.createDataFrame(rows, TICK_SCHEMA)
    n_per_key: dict[str, int] = {}
    for (k, m, bid, ask) in ticks:
        n_per_key[k] = n_per_key.get(k, 0) + 1
    n_total = len(rows)

    tb = tick_bars(df, bar_size=5).collect()
    assert sum(b.n_ticks for b in tb) == n_total
    per_key: dict[str, list] = {}
    for b in tb:
        per_key.setdefault(b.key, []).append(b)
    for k, bs in per_key.items():
        assert len(bs) == _math.ceil(n_per_key[k] / 5)
        bs.sort(key=lambda b: b.bar)
        for b in bs[:-1]:
            assert b.n_ticks == 5
        assert 1 <= bs[-1].n_ticks <= 5

    T = 500.0
    db = dollar_bars(df, threshold=T).collect()
    assert sum(b.n_ticks for b in db) == n_total
    last = {}
    for b in db:
        last[b.key] = max(last.get(b.key, -1), b.bar)
    for b in db:
        if b.bar < last[b.key]:
            assert b.bar_value - b.close < T + 1e-6

    thr = 3
    ib = imbalance_bars(df, threshold=thr).collect()
    assert sum(b.n_ticks for b in ib) == n_total
    last = {}
    for b in ib:
        last[b.key] = max(last.get(b.key, -1), b.bar)
        assert b.n_buy - b.n_sell == b.imbalance
    for b in ib:
        if b.bar < last[b.key]:
            assert abs(b.imbalance) == thr
        else:
            assert abs(b.imbalance) <= thr


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    moves=st.lists(st.sampled_from([-1, -1, 0, 0, 0, 1, 1]),
                   min_size=1, max_size=300),
    threshold=st.integers(1, 9),
    batch=st.integers(1, 64),
    keys=st.integers(1, 3),
    carry_split=st.integers(0, 299),
)
def test_imbalance_lattice_fold_equals_per_tick_reference(
        moves, threshold, batch, keys, carry_split):
    """The round-10 lattice-vectorized imbalance fold must equal the
    per-tick reference recursion EXACTLY for any price path (flats,
    reversals), any threshold, any Arrow batch split (including
    splits mid-bar and mid-key), and any number of key segments —
    the pure-python fold below IS the spec (same logic the recursive
    CTE oracle replays)."""
    import numpy as np
    import pandas as pd

    import data_timeseries_java_spark.operators.bars as B
    import unittest.mock as um

    # build a multi-key frame: same move sequence split across keys
    n = len(moves)
    px = 100.0 + np.cumsum(np.asarray(moves, dtype="float64")) * 0.5
    ks = np.repeat([f"K{i}" for i in range(keys)],
                   [n // keys + (1 if i < n % keys else 0)
                    for i in range(keys)])
    ts = pd.to_datetime(np.arange(n) * 1000, unit="ms")
    pdf = pd.DataFrame({"key": ks, "event_time": ts, "ask": px})

    captured = {}

    class FakeDF:
        def where(self, *a): return self
        def select(self, *a): return self
        def repartition(self, *a): return self
        def sortWithinPartitions(self, *a): return self
        def mapInPandas(self, fold, schema):
            captured["fold"] = fold
            return None

    with um.patch.object(B, "F") as fx:
        fx.col = lambda c: None
        B.imbalance_bars(FakeDF(), threshold=threshold)
    batches = [pdf.iloc[i:i + batch] for i in range(0, n, batch)]
    got = list(captured["fold"](iter(batches)))
    got = (pd.concat(got, ignore_index=True) if got
           else pd.DataFrame(columns=[
               "key", "bar", "n_ticks", "n_buy", "n_sell", "imbalance",
               "open", "close", "t_open_ms", "t_close_ms"]))

    # per-tick reference (the spec)
    ref = []
    key = None
    bar = nn = buy = sell = imb = 0
    open_px = 0.0
    t_open = 0
    prev = float("nan")
    last = 0
    ts_ms = (np.arange(n) * 1000).astype("int64")
    for i in range(n):
        p, t = float(px[i]), int(ts_ms[i])
        if ks[i] != key:
            if key is not None and nn > 0:
                ref.append((key, bar, nn, buy, sell, imb,
                            open_px, pprev, t_open, tprev))
            key = ks[i]
            bar = nn = buy = sell = imb = 0
            prev, last = float("nan"), 0
        if prev == prev:
            if p > prev:
                last = 1
            elif p < prev:
                last = -1
        prev = p
        if nn == 0:
            open_px, t_open = p, t
        nn += 1
        imb += last
        buy += last == 1
        sell += last == -1
        pprev, tprev = p, t
        if abs(imb) >= threshold:
            ref.append((key, bar, nn, buy, sell, imb, open_px, p,
                        t_open, t))
            bar += 1
            nn = buy = sell = imb = 0
    if key is not None and nn > 0:
        ref.append((key, bar, nn, buy, sell, imb, open_px, pprev,
                    t_open, tprev))
    refdf = pd.DataFrame(ref, columns=list(got.columns))
    assert len(got) == len(refdf)
    if len(got):
        for c in got.columns:
            assert (got[c].to_numpy() == refdf[c].to_numpy()).all(), c
