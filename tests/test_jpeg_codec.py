"""Pure-Python baseline JPEG codec (functions/jpeg.py): round trips
across color/subsampling/restart configurations, the constant-gray
exactness the media_jpeg_decode oracle depends on, and the honest
NotImplementedError boundary for non-baseline streams."""

from __future__ import annotations

import numpy as np
import pytest

from data_timeseries_java_spark.functions.jpeg import (
    decode_jpeg,
    encode_jpeg,
    quality_scaled_tables,
)
from data_timeseries_java_spark.functions.png import (
    decode_image,
    decode_png,
    jpeg_header_stats,
)


def _smooth_rgb(h: int = 37, w: int = 53, seed: int = 11) -> np.ndarray:
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:h, 0:w]
    g = np.clip(128 + 40 * np.sin(x / 9) + 30 * np.cos(y / 7)
                + rng.normal(0, 3, (h, w)), 0, 255).astype(np.uint8)
    return np.stack([g, np.roll(g, 3, axis=1), 255 - g], axis=-1)


def test_constant_gray_roundtrip_is_exact_at_q75():
    """The media_jpeg_decode oracle contract: at quality 75 the Annex K
    luma DC quantizer is exactly 8 and a constant block has only the DC
    coefficient 8*(v-128), so EVERY gray value survives bit-exact."""
    ql, _ = quality_scaled_tables(75)
    assert ql[0, 0] == 8
    for v in (0, 1, 17, 127, 128, 137, 254, 255):
        img = np.full((11, 23), v, dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(img, 75))
        assert out.shape == (11, 23, 1)
        assert np.all(out == v), f"value {v} not exact"


def test_header_stats_of_own_streams():
    data = encode_jpeg(np.zeros((24, 40), np.uint8))
    assert jpeg_header_stats(data) == (40, 24, 1)
    data = encode_jpeg(_smooth_rgb(17, 29), subsample=True)
    assert jpeg_header_stats(data) == (29, 17, 3)


def test_smooth_rgb_roundtrip_within_quantization_error():
    rgb = _smooth_rgb()
    out = decode_jpeg(encode_jpeg(rgb, 85))
    assert out.shape == rgb.shape
    err = np.abs(out.astype(int) - rgb.astype(int))
    assert err.mean() < 4 and err.max() < 25


@pytest.mark.parametrize("restart", [0, 3])
def test_subsampled_420_roundtrip(restart):
    """4:2:0 layout (2x2 Y sampling + decimated chroma) and restart
    markers — the stream shapes real photo encoders emit."""
    rgb = _smooth_rgb(37, 53)
    data = encode_jpeg(rgb, 85, subsample=True, restart_interval=restart)
    out = decode_jpeg(data)
    assert out.shape == rgb.shape
    err = np.abs(out.astype(int) - rgb.astype(int))
    assert err.mean() < 5 and err.max() < 35


def test_restart_markers_change_bytes_not_pixels():
    g = _smooth_rgb(16, 24)
    plain = encode_jpeg(g, 85)
    rst = encode_jpeg(g, 85, restart_interval=2)
    assert plain != rst and b"\xff\xdd" in rst   # DRI present
    assert np.array_equal(decode_jpeg(plain), decode_jpeg(rst))


def test_noise_roundtrip_bounded():
    rng = np.random.default_rng(7)
    noise = rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(noise, 90))
    err = np.abs(out.astype(int) - noise.astype(int))
    assert err.mean() < 12   # lossy on noise by design, but bounded


def test_odd_dimensions_crop_back():
    for h, w in ((1, 1), (7, 9), (8, 8), (9, 17), (15, 16)):
        img = np.full((h, w), 200, dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(img, 75))
        assert out.shape == (h, w, 1)
        assert np.all(out == 200)


def test_decode_image_dispatches_both_formats():
    from data_timeseries_java_spark.functions.png import encode_png

    img = np.full((6, 10, 3), 90, dtype=np.uint8)
    assert decode_image(encode_png(img)).shape == (6, 10, 3)
    assert decode_image(encode_jpeg(img, 75)).shape == (6, 10, 3)
    with pytest.raises(NotImplementedError):
        decode_image(b"RIFF....WEBP")
    with pytest.raises(NotImplementedError):
        decode_image(b"")


def test_decode_png_stays_png_only():
    with pytest.raises(NotImplementedError, match="PNG-only"):
        decode_png(encode_jpeg(np.zeros((8, 8), np.uint8)))


def test_progressive_jpeg_raises_at_boundary():
    """Flip our own SOF0 marker to SOF2 (progressive): header stats
    still parse, pixel decode refuses honestly."""
    data = bytearray(encode_jpeg(np.zeros((8, 8), np.uint8)))
    idx = data.find(b"\xff\xc0")
    assert idx > 0
    data[idx + 1] = 0xC2
    assert jpeg_header_stats(bytes(data)) == (8, 8, 1)
    with pytest.raises(NotImplementedError, match="SOF"):
        decode_jpeg(bytes(data))


def test_malformed_streams_raise_value_error():
    good = encode_jpeg(np.full((8, 8), 50, np.uint8))
    with pytest.raises(ValueError):
        decode_jpeg(good[:20])            # truncated mid-segment
    broken = good.replace(b"\xff\xda", b"\xff\xd9", 1)
    with pytest.raises(ValueError):
        decode_jpeg(broken)               # EOI before any scan
    with pytest.raises(NotImplementedError):
        decode_jpeg(b"\x00\x01\x02")      # not a JPEG at all


def test_quality_scaling_bounds():
    for q in (1, 10, 50, 75, 100):
        ql, qc = quality_scaled_tables(q)
        assert ql.min() >= 1 and ql.max() <= 255
        assert qc.min() >= 1 and qc.max() <= 255
    with pytest.raises(ValueError):
        quality_scaled_tables(0)
    # monotone: higher quality → finer quantizers
    assert quality_scaled_tables(90)[0].sum() < quality_scaled_tables(50)[0].sum()


def test_resize_images_handles_jpeg_payloads(spark):
    """resize_images decodes JPEG payloads for real (decode_image
    dispatch) and re-encodes the resized pixels as PNG."""
    from pyspark.sql import functions as F

    from data_timeseries_java_spark.operators.multimodal import resize_images

    img = np.full((24, 32), 180, dtype=np.uint8)
    media = spark.createDataFrame(
        [(1, bytearray(encode_jpeg(img, 75)), "image")],
        "media_id long, payload binary, modality string")
    out = resize_images(media, width=8, height=6).collect()
    assert len(out) == 1
    px = decode_png(bytes(out[0].resized))
    assert px.shape == (6, 8, 1)
    assert np.all(px == 180)  # constant gray q75 is bit-exact end to end


def test_scalar_and_vectorized_entropy_coders_are_byte_identical():
    """encode_jpeg dispatches small images to a sequential emitter and
    larger ones to the vectorized `_encode_scan`; both must produce the
    same bytes on either side of the cutoff, across gray/color,
    subsampling, restart intervals and quality extremes."""
    from data_timeseries_java_spark.functions import jpeg as J

    rng = np.random.default_rng(11)
    for trial in range(30):
        h, w = int(rng.integers(1, 80)), int(rng.integers(1, 80))
        color = bool(rng.integers(0, 2))
        img = rng.integers(
            0, 255, (h, w, 3) if color else (h, w)).astype(np.uint8)
        kw = {}
        if color and rng.random() < 0.3:
            kw["subsample"] = True
        if rng.random() < 0.3:
            kw["restart_interval"] = int(rng.integers(1, 5))
        q = int(rng.integers(1, 101))
        old_cutoff = J._SCALAR_ENCODE_CUTOFF
        try:
            J._SCALAR_ENCODE_CUTOFF = 0          # force vector path
            vec = J.encode_jpeg(img, q, **kw)
            J._SCALAR_ENCODE_CUTOFF = 10 ** 9    # force scalar path
            sca = J.encode_jpeg(img, q, **kw)
        finally:
            J._SCALAR_ENCODE_CUTOFF = old_cutoff
        assert vec == sca, (h, w, color, kw, q)
        # and the stream round-trips through the decoder
        assert decode_jpeg(vec).shape[:2] == (h, w)
