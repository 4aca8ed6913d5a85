"""MJPEG-AVI container (functions/avi.py): write/demux round trips,
header stats, the frame-sampling real path, and the honest boundary
for non-MJPEG video."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_timeseries_java_spark.functions.avi import (
    avi_header_stats,
    decode_avi_frames,
    encode_avi_mjpeg,
)
from data_timeseries_java_spark.functions.jpeg import decode_jpeg, encode_jpeg


def _mk(vals, w=20, h=12, fps=5):
    return encode_avi_mjpeg(
        [encode_jpeg(np.full((h, w), v, np.uint8), 75) for v in vals],
        w, h, fps=fps)


def test_roundtrip_demux_and_decode():
    avi = _mk([10, 99, 200])
    assert avi_header_stats(avi) == (20, 12, 3, 5)
    frames = decode_avi_frames(avi)
    assert [int(decode_jpeg(f)[0, 0, 0]) for f in frames] == [10, 99, 200]


def test_error_contract():
    avi = _mk([50, 60])
    with pytest.raises(NotImplementedError):
        decode_avi_frames(b"not a movie")
    with pytest.raises(ValueError, match="truncated AVI"):
        decode_avi_frames(avi[:40])
    # frame chunks that are not JPEG: recognized container, absent codec
    raw = avi.replace(b"\xff\xd8\xff", b"\x00\x00\x00", 1)
    with pytest.raises(NotImplementedError, match="not MJPEG"):
        decode_avi_frames(raw)


def test_sample_frames_real_path(spark):
    """sample_frames demuxes REAL frames from AVI payloads (evenly
    spaced picks, container-fps timestamps) while non-video payloads
    keep the slice fake."""
    from data_timeseries_java_spark.operators.multimodal import sample_frames

    avi = _mk([7, 70, 140, 210], fps=10)
    media = spark.createDataFrame(
        [(1, bytearray(avi), "video"), (2, bytearray(b"plain bytes"), "text")],
        "media_id long, payload binary, modality string")
    rows = {(r.media_id, r.frame_idx): r
            for r in sample_frames(media, n_frames=2).collect()}
    assert set(rows) == {(1, 0), (1, 1), (2, 0), (2, 1)}
    # evenly spaced picks over 4 frames with n=2 → frames 0 and 2
    assert int(decode_jpeg(bytes(rows[(1, 0)].frame))[0, 0, 0]) == 7
    assert int(decode_jpeg(bytes(rows[(1, 1)].frame))[0, 0, 0]) == 140
    # timestamp is the SOURCE frame's time: frame 2 at 10 fps → 200 ms
    assert rows[(1, 1)].frame_ts_ms == 200
    # fake path: payload slices, not JPEG
    assert bytes(rows[(2, 0)].frame) in b"plain bytes"


def test_video_frame_stats_closed_form(spark):
    from data_timeseries_java_spark.operators.multimodal import (
        synthesize_avi_media,
        video_frame_stats,
    )

    ids = spark.range(12).select(F.col("id").alias("media_id"))
    got = {(r.media_id, r.frame_idx): r
           for r in video_frame_stats(synthesize_avi_media(ids)).collect()}
    for i in range(12):
        w, h, nf = 8 + i % 9, 6 + i % 5, 2 + i % 4
        for f in range(nf):
            r = got[(i, f)]
            assert (r.width, r.height) == (w, h)
            assert r.pixel_sum == w * h * ((i + 17 * f) % 256)
    assert len(got) == sum(2 + i % 4 for i in range(12))

def test_video_frame_stats_fanout_identical(spark):
    """The round-15 per-frame fan-out arm (demux stage -> keyed
    repartition -> decode stage) must be row-identical to the fused
    default — the bit-exactness pin for the 100 TB large-file shape
    (fan-out spreads FRAMES, and pixel stats are per-frame pure
    functions of the demuxed bytes)."""
    from data_timeseries_java_spark.operators.multimodal import (
        synthesize_avi_media,
        video_frame_stats,
    )

    ids = spark.range(16).select(F.col("id").alias("media_id"))
    media = synthesize_avi_media(ids)
    fused = sorted(map(tuple, video_frame_stats(media).collect()))
    fanned = sorted(map(tuple,
                        video_frame_stats(media, fanout=5).collect()))
    assert fanned == fused and len(fused) > 0
    # the fan-out plan genuinely splits the boundary: demux and decode
    # as separate MapInPandas nodes with one more exchange between
    # them than the fused shape (which pays only the synth spread)
    import re

    from data_timeseries_java_spark.plans.inspect import (
        exchange_count, formatted_plan)

    def pandas_nodes(df):
        return len(re.findall(r"\(\d+\) MapInPandas",
                              formatted_plan(df)))

    fanned_df = video_frame_stats(media, fanout=5)
    fused_df = video_frame_stats(media)
    assert pandas_nodes(fanned_df) == pandas_nodes(fused_df) + 1
    assert exchange_count(fanned_df) == exchange_count(fused_df) + 1
