"""Pure-Python PNG codec: roundtrip, all five scanline filters, resize,
and the honest NotImplementedError boundary for formats that genuinely
need a native library (JPEG, palette/16-bit/interlaced PNG)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from data_timeseries_java_spark.functions.png import (
    PNG_MAGIC,
    decode_png,
    encode_jpeg_header,
    encode_png,
    image_header_stats,
    jpeg_header_stats,
    png_header_stats,
    resize_nearest,
)


@pytest.mark.parametrize("shape", [
    (1, 1, 1), (3, 5, 1), (7, 4, 3), (9, 13, 4), (64, 64, 3)])
def test_roundtrip_identity(shape):
    rng = np.random.default_rng(7)
    a = rng.integers(0, 256, shape, dtype=np.uint8)
    assert (decode_png(encode_png(a)) == a).all()


def test_encoded_bytes_are_spec_conformant_png():
    png = encode_png(np.zeros((2, 3, 3), dtype=np.uint8))
    assert png[:8] == PNG_MAGIC
    # chunk walk: IHDR first, IEND last, CRCs valid
    pos, tags = 8, []
    while pos + 8 <= len(png):
        (length,) = struct.unpack(">I", png[pos:pos + 4])
        tag = png[pos + 4:pos + 8]
        body = png[pos + 8:pos + 8 + length]
        (crc,) = struct.unpack(
            ">I", png[pos + 8 + length:pos + 12 + length])
        assert crc == zlib.crc32(tag + body) & 0xFFFFFFFF
        tags.append(tag)
        pos += 12 + length
    assert tags[0] == b"IHDR" and tags[-1] == b"IEND"


def _encode_with_filter(arr: np.ndarray, filt: int) -> bytes:
    """Independent encoder forcing one filter type on every scanline —
    written from the spec, not from the production encoder, so the
    decoder's unfilter arithmetic is tested against a second opinion."""
    h, w, ch = arr.shape
    raw = bytearray()
    prev = np.zeros(w * ch, np.int32)
    for r in range(h):
        row = arr[r].reshape(-1).astype(np.int32)
        raw.append(filt)
        enc = row.copy()
        for i in range(len(row)):
            a = row[i - ch] if i >= ch else 0
            b = prev[i]
            c = prev[i - ch] if i >= ch else 0
            if filt == 1:
                enc[i] = (row[i] - a) & 0xFF
            elif filt == 2:
                enc[i] = (row[i] - b) & 0xFF
            elif filt == 3:
                enc[i] = (row[i] - ((a + b) >> 1)) & 0xFF
            elif filt == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else \
                    (b if pb <= pc else c)
                enc[i] = (row[i] - pred) & 0xFF
        raw.extend(np.array(enc, dtype=np.uint8).tobytes())
        prev = row

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b""))


@pytest.mark.parametrize("filt", [0, 1, 2, 3, 4])
def test_decode_every_filter_type(filt):
    rng = np.random.default_rng(filt)
    a = rng.integers(0, 256, (5, 4, 3), dtype=np.uint8)
    assert (decode_png(_encode_with_filter(a, filt)) == a).all()


def test_resize_nearest_exact_indices():
    a = np.arange(100, dtype=np.uint8).reshape(10, 10, 1)
    r = resize_nearest(a, 5, 5)
    assert r.shape == (5, 5, 1)
    # nearest-neighbor = floor-index sampling: out[i,j] = in[2i, 2j]
    assert (r[:, :, 0] == a[::2, ::2, 0]).all()


def test_resize_then_roundtrip():
    rng = np.random.default_rng(3)
    a = rng.integers(0, 256, (8, 8, 4), dtype=np.uint8)
    resized = decode_png(encode_png(resize_nearest(a, 4, 4)))
    assert resized.shape == (4, 4, 4)
    assert (resized == a[::2, ::2]).all()


@pytest.mark.parametrize("payload", [
    b"\xff\xd8\xff\xe0JFIF", b"not an image", b"", None])
def test_native_codec_boundary_raises(payload):
    with pytest.raises(NotImplementedError):
        decode_png(payload)


def test_unsupported_png_subset_raises():
    # 16-bit depth IHDR: parsed, then refused with the subset named
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    png = PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError, match="depth=16"):
        decode_png(png)


def test_malformed_payload_error_contract():
    """Truncated/corrupt payloads of a RECOGNIZED format must fail with
    ValueError at the documented boundary — never a struct.error or
    zlib.error escaping from deep inside (opaque executor failures)."""
    good = encode_png(np.arange(24, dtype=np.uint8).reshape(2, 4, 3))
    # truncate mid-IDAT: chunk declares more body bytes than remain
    with pytest.raises(ValueError, match="truncated PNG"):
        decode_png(good[:40])
    # oversized declared length on an otherwise intact stream
    bad = bytearray(good)
    bad[8:12] = struct.pack(">I", 10_000)
    with pytest.raises(ValueError, match="truncated PNG"):
        decode_png(bytes(bad))
    # valid chunk walk, corrupt deflate stream inside IDAT
    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    png = (PNG_MAGIC + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", b"\x00garbage\xff") + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="corrupt PNG IDAT"):
        decode_png(png)
    # short IHDR body caught at the walk, not struct.unpack
    png = PNG_MAGIC + chunk(b"IHDR", b"\x00\x01") + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="IHDR length"):
        decode_png(png)


def test_png_header_stats_without_decode():
    a = np.arange(60, dtype=np.uint8).reshape(3, 5, 4)
    assert png_header_stats(encode_png(a)) == (5, 3, 4)
    with pytest.raises(NotImplementedError):
        png_header_stats(b"\xff\xd8\xffJFIF")


@pytest.mark.parametrize("w,h,ch", [
    (1, 1, 1), (16, 9, 3), (640, 480, 3), (65535, 65535, 1)])
def test_jpeg_sof_roundtrip(w, h, ch):
    """The SOF scanner recovers exactly the dimensions the fixture
    encoder wrote — through real APP0/SOF0/SOS marker structure."""
    payload = encode_jpeg_header(w, h, ch)
    assert jpeg_header_stats(payload) == (w, h, ch)
    assert image_header_stats(payload) == ("jpeg", w, h, ch)


def test_jpeg_header_error_contract():
    good = encode_jpeg_header(16, 9, 3)
    # truncated before the SOF marker completes
    with pytest.raises(ValueError, match="truncated JPEG"):
        jpeg_header_stats(good[:8])
    # SOS reached with no SOF seen: cut the SOF0 segment out
    sof_at = good.index(b"\xff\xc0")
    sof_len = 2 + int.from_bytes(good[sof_at + 2:sof_at + 4], "big")
    no_sof = good[:sof_at] + good[sof_at + sof_len:]
    with pytest.raises(ValueError, match="no SOF"):
        jpeg_header_stats(no_sof)
    with pytest.raises(NotImplementedError):
        jpeg_header_stats(b"not a jpeg")
    # decode_png stays PNG-only and points at the JPEG codec
    with pytest.raises(NotImplementedError, match="decode_jpeg"):
        decode_png(good)


def test_spark_jpeg_header_path(spark):
    """synthesize -> extract headers through mapInPandas: closed-form
    dims recovered for every id."""
    from data_timeseries_java_spark.operators.multimodal import (
        extract_image_headers, synthesize_jpeg_media, synthesize_png_media)
    import pyspark.sql.functions as F

    ids = spark.range(20).select(F.col("id").alias("media_id"))
    rows = {r.media_id: r
            for r in extract_image_headers(synthesize_jpeg_media(ids)).collect()}
    assert len(rows) == 20
    for i, r in rows.items():
        assert (r.format, r.width, r.height, r.channels) == (
            "jpeg", 4 + i % 13, 3 + i % 7, 1 if i % 2 == 0 else 3)
    # the same operator reads PNG headers (IHDR walk, no inflate)
    png_rows = {r.media_id: r
                for r in extract_image_headers(
                    synthesize_png_media(ids)).collect()}
    for i, r in png_rows.items():
        assert (r.format, r.width, r.height) == ("png", 4 + i % 13, 3 + i % 7)


def test_spark_png_resize_real_path(spark):
    """synthesize -> resize -> decode through mapInPandas: output PNGs
    are genuine and carry the requested dimensions."""
    from data_timeseries_java_spark.operators.multimodal import (
        decode_image_stats, resize_images, synthesize_png_media)
    import pyspark.sql.functions as F

    ids = spark.range(12).select(F.col("id").alias("media_id"))
    media = synthesize_png_media(ids).withColumn(
        "modality", F.lit("image"))
    resized = resize_images(media, 6, 5).select(
        "media_id", F.col("resized").alias("payload"))
    stats = decode_image_stats(resized).collect()
    assert len(stats) == 12
    assert all(r.width == 6 and r.height == 5 for r in stats)
    # channel count survives the resize
    assert sorted({r.channels for r in stats}) == [1, 3, 4]


def test_roundtrip_property():
    """Property: decode(encode(x)) == x for every 8-bit image shape the
    codec owns (hypothesis over dims/channels/content)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from hypothesis.extra.numpy import arrays

    @settings(max_examples=60, deadline=None)
    @given(
        h=st.integers(1, 24), w=st.integers(1, 24),
        ch=st.sampled_from([1, 3, 4]),
        data=st.data(),
    )
    def run(h, w, ch, data):
        a = data.draw(arrays(np.uint8, (h, w, ch)))
        assert (decode_png(encode_png(a)) == a).all()

    run()
