"""Pure-Python WAV PCM codec (functions/wav.py): round trips, header
stats, the error contract, and the Spark audio-features path."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from data_timeseries_java_spark.functions.wav import (
    decode_wav,
    encode_wav,
    wav_header_stats,
)


def test_roundtrip_mono_and_stereo():
    rng = np.random.default_rng(5)
    mono = rng.integers(-32768, 32767, 777, dtype=np.int16)
    out, rate = decode_wav(encode_wav(mono, 16000))
    assert rate == 16000 and out.shape == (777, 1)
    assert np.array_equal(out[:, 0], mono)

    stereo = rng.integers(-32768, 32767, (333, 2), dtype=np.int16)
    out, rate = decode_wav(encode_wav(stereo, 44100))
    assert rate == 44100 and out.shape == (333, 2)
    assert np.array_equal(out, stereo)


def test_header_stats_without_decode():
    data = encode_wav(np.zeros((50, 2), np.int16), 22050)
    assert wav_header_stats(data) == (22050, 2, 16, 50)


def test_eight_bit_pcm_decodes():
    """Hand-build an 8-bit PCM stream (our encoder only writes 16-bit);
    the decoder widens with the standard x*256 - 32768 mapping."""
    raw = bytes([0, 128, 255])
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(raw)) + raw)
    data = b"RIFF" + struct.pack("<I", len(body)) + body
    out, rate = decode_wav(data)
    assert rate == 8000
    assert out[:, 0].tolist() == [-32768, 0, 255 * 256 - 32768]


def test_error_contract():
    good = encode_wav(np.zeros(16, np.int16))
    with pytest.raises(NotImplementedError):
        wav_header_stats(b"not audio at all")
    with pytest.raises(ValueError, match="truncated WAV"):
        wav_header_stats(good[:30])
    # IEEE-float format tag (3): recognized container, unsupported codec
    float_fmt = bytearray(good)
    float_fmt[20] = 3
    with pytest.raises(NotImplementedError, match="format tag 3"):
        wav_header_stats(bytes(float_fmt))


def test_unaligned_data_chunk_is_value_error():
    """A data chunk whose byte length is not a multiple of block-align
    must raise the codec's ValueError contract, not leak a raw numpy
    reshape/frombuffer error from decode_wav."""
    good = encode_wav(np.zeros(16, np.int16), sample_rate=8000)
    # stereo 16-bit: block align 4; chop 2 bytes off the data chunk and
    # rewrite the RIFF/data sizes so the container itself stays valid
    stereo = encode_wav(np.zeros((16, 2), np.int16))
    trimmed = bytearray(stereo[:-2])
    data_size = struct.unpack("<I", stereo[40:44])[0]
    trimmed[40:44] = struct.pack("<I", data_size - 2)
    trimmed[4:8] = struct.pack("<I", struct.unpack("<I", stereo[4:8])[0] - 2)
    with pytest.raises(ValueError, match="not .*aligned|aligned"):
        wav_header_stats(bytes(trimmed))
    with pytest.raises(ValueError):
        decode_wav(bytes(trimmed))
    # and the aligned original still decodes
    assert decode_wav(good)[0].shape == (16, 1)


def test_spark_audio_features_path(spark):
    """synthesize → decode → features through mapInPandas: the closed
    form the media_wav_features oracle uses, checked in-process."""
    from data_timeseries_java_spark.operators.multimodal import (
        audio_features,
        synthesize_wav_media,
    )

    ids = spark.range(20).select(F_col("id").alias("media_id"))
    feats = {r.media_id: r for r in
             audio_features(synthesize_wav_media(ids)).collect()}
    assert len(feats) == 20
    for i in range(20):
        d, a = i % 50, 100 + i % 100
        n = 2 * (32 + i % 64)
        r = feats[i]
        assert r.sample_rate == 8000 + 1000 * (i % 3)
        assert r.n_samples == n and r.channels == 1
        assert r.mean_amp == float(d)
        want_rms = np.floor(np.sqrt(d * d + a * a) * 1e6 + 0.5) / 1e6
        assert r.rms == want_rms
        assert r.zero_crossings == n - 1


def F_col(name):
    from pyspark.sql import functions as F
    return F.col(name)
