"""Multimodal columns: opaque binary payloads with typed metadata.

Images/audio/video ride through the engine as ``binary`` columns plus a
metadata struct (modality, byte size, content hash). PNG, baseline
JPEG, PCM WAV, and MJPEG-AVI video get REAL pure-Python codecs
(``functions/png.py`` / ``jpeg.py`` / ``wav.py`` / ``avi.py`` — no
native library needed), so decode / resize / feature-extraction /
frame-demux on those payloads produce genuine sample-accurate results.
Formats that genuinely need a native library (inter-frame video codecs,
progressive JPEG, palette/16-bit PNG, compressed audio) raise
``NotImplementedError`` at the codec boundary; non-image payloads fall
to a deterministic fake so the batching plumbing stays exercised on
arbitrary testdata.

Decode/feature-extract run as ``mapInPandas`` (per-partition Arrow
batches): at 100 TB this is the right shape — the binary column never
leaves the executor, batches amortize Python crossing, and partition
sizing (``spark.sql.files.maxPartitionBytes``) bounds memory per task.

Pluggable decoder: the pixel-inflating operators
(``decode_image_stats`` / ``resize_images`` / ``decode_features`` /
``video_frame_stats``) accept ``decoder: bytes -> (h, w, c) uint8
ndarray``, defaulting to the pure-Python codecs. On a real cluster the
Python Huffman/DCT loop is the measured throughput ceiling (SCALE.md
"Media codec throughput"), and a native decoder (PIL / libjpeg-turbo /
pyturbojpeg) drops in through this hook without forking any operator —
the callable is cloudpickled to executors like any other UDF closure.
Header-only passes never inflate pixels and take no decoder.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Callable, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_timeseries_java_spark.functions.png import (
    PNG_MAGIC,
    decode_image,
    decode_png,
    encode_jpeg_header,
    encode_png,
    image_header_stats,
    resize_nearest,
)

# payload bytes -> (height, width, channels) uint8 pixel array; raise
# NotImplementedError at a codec boundary, ValueError on corrupt bytes
# (the same contract the pure-Python codecs implement)
ImageDecoder = Callable[[bytes], "object"]

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("modality", T.StringType(), False),
    T.StructField("byte_len", T.LongType(), False),
    T.StructField("content_md5", T.StringType(), False),
])

FEATURE_SCHEMA = ("media_id long, modality string, byte_len long, "
                  "width int, height int, n_frames int, feature array<float>")


def attach_binary_metadata(df: DataFrame, payload_col: str = "payload",
                           id_col: str = "media_id") -> DataFrame:
    """Typed metadata for an opaque binary column — all JVM built-ins."""
    return df.select(
        F.col(id_col),
        F.col(payload_col),
        F.octet_length(F.col(payload_col)).cast("long").alias("byte_len"),
        F.md5(F.col(payload_col)).alias("content_md5"),
    )


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as a fake media payload so the
    binary plumbing is exercised on real testdata."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("image").alias("modality"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int, list[float]]:
    """Deterministic fake decode for NON-IMAGE payloads (e.g. text bytes
    adapted through ``documents_as_media``) so the batching plumbing is
    exercised on arbitrary testdata. Real image payloads never reach
    this — ``_decode`` dispatches PNG to the real codec first.

    Raises NotImplementedError if payload is None (no bytes to decode).
    """
    if payload is None:
        raise NotImplementedError("real codec required for empty payload")
    n = len(payload)
    width = 16 + n % 64
    height = 16 + (n // 64) % 64
    n_frames = 1
    # 8-dim "feature": byte histogram over 8 buckets, L1-normalized
    hist = [0.0] * 8
    for by in payload:
        hist[by % 8] += 1.0
    total = sum(hist) or 1.0
    return width, height, n_frames, [h / total for h in hist]


def _decode(payload: bytes,
            decoder: Optional[ImageDecoder] = None
            ) -> tuple[int, int, int, list[float]]:
    """Codec dispatch: PNG and baseline JPEG -> real pixel decode
    (exact dims + pixel-histogram feature) through ``decoder``
    (pure-Python codecs by default); progressive JPEG / unknown image
    magic -> the decoder raises NotImplementedError; other payloads ->
    fake."""
    if payload is not None and (payload[:8] == bytes(PNG_MAGIC)
                                or payload[:3] == b"\xff\xd8\xff"):
        pixels = (decoder or decode_image)(payload)
        h, w, _ch = pixels.shape
        import numpy as np
        hist = np.bincount(pixels.reshape(-1) % 8, minlength=8) \
            .astype("float64")
        hist /= hist.sum() or 1.0
        return w, h, 1, hist.tolist()
    return _fake_decode(payload)


def decode_features(media: DataFrame,
                    decoder: Optional[ImageDecoder] = None) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batch iterator).
    Batch shape: input/output pandas DataFrames per partition chunk.
    ``decoder`` swaps the pixel codec (see module docstring)."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for mid, payload, modality in zip(
                    pdf["media_id"], pdf["payload"], pdf["modality"]):
                w, h, nf, feat = _decode(payload, decoder)
                rows.append({
                    "media_id": mid,
                    "modality": modality,
                    "byte_len": len(payload),
                    "width": w, "height": h, "n_frames": nf,
                    "feature": feat,
                })
            yield pd.DataFrame(rows, columns=[
                "media_id", "modality", "byte_len", "width", "height",
                "n_frames", "feature"])

    return media.mapInPandas(run, FEATURE_SCHEMA)


RESIZE_SCHEMA = ("media_id long, modality string, width int, height int, "
                 "resized binary")
PNG_MEDIA_SCHEMA = "media_id long, payload binary"
IMAGE_STATS_SCHEMA = ("media_id long, width int, height int, channels int, "
                      "pixel_sum long")


def _spread(ids: DataFrame) -> DataFrame:
    """Round-robin the id stream across the cluster before a codec
    fan-out. The id source is typically one small parquet file (one
    input split), which would serialize the ENTIRE synthesize+decode
    lane into a single task — measured 6.8 s for media_video_frames at
    sf0.1 with ~0.1 ms/frame codec cost, i.e. parallelism-starved, not
    codec-bound. Shuffling a few thousand longs costs microseconds;
    real payload tables read from many splits and never need this."""
    sc = ids.sparkSession.sparkContext
    return ids.repartition(sc.defaultParallelism)


def synthesize_png_media(ids: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Deterministic PNG payload per id — REAL spec-conformant PNG bytes
    via ``encode_png``, with dimensions/pixels that are closed-form
    functions of the id so an external oracle can verify the decode:

        width    = 4 + id % 13          (4..16)
        height   = 3 + id % 7           (3..9)
        channels = {0: 1, 1: 3, 2: 4}[id % 3]   (gray / RGB / RGBA)
        pixel[r, c, k] = (id % 200) + r   (row gradient; never wraps)

    The row gradient makes every scanline differ from its neighbor by a
    constant, so the encoder's Sub/Up filters carry real deltas and the
    decoder's unfilter arithmetic is genuinely on the data path.
    """
    import numpy as np
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            payloads = []
            for mid in pdf[id_col]:
                i = int(mid)
                w, h = 4 + i % 13, 3 + i % 7
                ch = {0: 1, 1: 3, 2: 4}[i % 3]
                base = i % 200
                col = (base + np.arange(h, dtype=np.uint8))[:, None, None]
                payloads.append(encode_png(
                    np.broadcast_to(col, (h, w, ch)).astype(np.uint8)))
            yield pd.DataFrame({"media_id": pdf[id_col].astype("int64"),
                                "payload": payloads})

    return _spread(ids).mapInPandas(run, PNG_MEDIA_SCHEMA)


JPEG_MEDIA_SCHEMA = "media_id long, payload binary"
HEADER_STATS_SCHEMA = ("media_id long, format string, width int, "
                      "height int, channels int")


def synthesize_jpeg_media(ids: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Deterministic JPEG header fixture per id (structurally valid
    SOI/APP0/SOF0/SOS/EOI marker stream — see ``encode_jpeg_header``):

        width      = 4 + id % 13    (4..16)
        height     = 3 + id % 7     (3..9)
        components = 1 if id even else 3   (grayscale / YCbCr)

    Closed-form in the id so an external oracle can verify the SOF
    parse without a JPEG encoder in the environment."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            payloads = []
            for mid in pdf[id_col]:
                i = int(mid)
                payloads.append(encode_jpeg_header(
                    4 + i % 13, 3 + i % 7, 1 if i % 2 == 0 else 3))
            yield pd.DataFrame({"media_id": pdf[id_col].astype("int64"),
                                "payload": payloads})

    return _spread(ids).mapInPandas(run, JPEG_MEDIA_SCHEMA)


def synthesize_jpeg_pixel_media(ids: DataFrame,
                                id_col: str = "media_id") -> DataFrame:
    """Deterministic REAL JPEG per id — full baseline streams from
    ``encode_jpeg`` (SOI/DQT/SOF0/DHT/SOS + entropy-coded pixel data),
    with a closed-form pixel recipe an external oracle can verify:

        width  = 4 + id % 13      (4..16)
        height = 3 + id % 7       (3..9)
        pixels = constant gray, value v = id % 256

    Constant gray is chosen because at quality 75 the Annex K luminance
    DC quantizer is exactly 8 (floor((16*50+50)/100)) and a constant
    block's only coefficient is DC = 8*(v-128), so quantization is
    LOSSLESS for every v — the decoded image equals the input exactly
    and pixel_sum = w*h*v is closed-form in the id. A hash match
    therefore certifies the whole marker/Huffman/DCT round trip on
    genuine entropy-coded data, not header parsing. (AC coefficients,
    subsampling and restart markers are pinned by the codec's own
    round-trip unit tests — their math is not SQL-expressible.)"""
    import numpy as np
    import pandas as pd

    from data_timeseries_java_spark.functions.jpeg import encode_jpeg

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            payloads = []
            for mid in pdf[id_col]:
                i = int(mid)
                w, h, v = 4 + i % 13, 3 + i % 7, i % 256
                payloads.append(encode_jpeg(
                    np.full((h, w), v, dtype=np.uint8), quality=75))
            yield pd.DataFrame({"media_id": pdf[id_col].astype("int64"),
                                "payload": payloads})

    return _spread(ids).mapInPandas(run, JPEG_MEDIA_SCHEMA)


def extract_image_headers(media: DataFrame) -> DataFrame:
    """Header-tier metadata for image payloads: format sniff + width/
    height/channels from header bytes alone (PNG IHDR walk, JPEG SOF
    scan — no inflate, no pixel decode). This is the metadata pass that
    stays cheap at 100 TB and covers JPEG even though its pixel decode
    raises at the codec boundary."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                fmt, w, h, ch = image_header_stats(payload)
                rows.append((int(mid), fmt, w, h, ch))
            yield pd.DataFrame(rows, columns=[
                "media_id", "format", "width", "height", "channels"])

    return media.mapInPandas(run, HEADER_STATS_SCHEMA)


def decode_image_stats(media: DataFrame,
                       decoder: Optional[ImageDecoder] = None) -> DataFrame:
    """REAL image decode -> exact (width, height, channels, pixel_sum).
    PNG and baseline JPEG decode for real; anything else raises at the
    codec boundary rather than fabricating stats. ``decoder`` swaps the
    pixel codec (see module docstring) — a native decoder must honor
    the same (h, w, c) uint8 contract for the stats to be identical."""
    import numpy as np
    import pandas as pd

    dec = decoder or decode_image

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                px = dec(payload)
                h, w, ch = px.shape
                rows.append((int(mid), w, h, ch,
                             int(px.sum(dtype=np.int64))))
            yield pd.DataFrame(rows, columns=[
                "media_id", "width", "height", "channels", "pixel_sum"])

    return media.mapInPandas(run, IMAGE_STATS_SCHEMA)
FRAMES_SCHEMA = ("media_id long, frame_idx int, frame_ts_ms long, "
                 "frame binary")


def resize_images(media: DataFrame, width: int = 224,
                  height: int = 224,
                  decoder: Optional[ImageDecoder] = None) -> DataFrame:
    """Resize: PNG and baseline JPEG payloads are REALLY resized
    (decode -> vectorized nearest-neighbor index sampling -> re-encode
    PNG); formats needing a native codec raise inside the decoder;
    non-image payloads keep the deterministic truncate/pad fake so
    batch shapes stay exercised. ``decoder`` swaps the pixel codec
    (see module docstring)."""
    import pandas as pd

    target = max(1, width * height // 64)
    dec = decoder or decode_image

    def _resize(payload: bytes) -> bytes:
        if payload is None:
            raise NotImplementedError("real codec required")
        if payload[:8] == bytes(PNG_MAGIC) or payload[:3] == b"\xff\xd8\xff":
            # level 1: the re-encode is the lane's measured bound and a
            # resized thumbnail is a throughput artifact, not an archive
            # — decoded pixels are identical at every zlib level
            return encode_png(resize_nearest(dec(payload), width, height),
                              level=1)
        return (payload * (target // max(len(payload), 1) + 1))[:target]

    def run(batches):
        for pdf in batches:
            out = pd.DataFrame({
                "media_id": pdf["media_id"],
                "modality": pdf["modality"],
                "width": width, "height": height,
                "resized": pdf["payload"].map(_resize),
            })
            yield out

    return media.mapInPandas(run, RESIZE_SCHEMA)


def sample_frames(media: DataFrame, n_frames: int = 4,
                  frame_interval_ms: int = 1000) -> DataFrame:
    """Frame sampling (video → n evenly spaced frames). MJPEG-AVI
    payloads are REALLY demuxed (``functions/avi.py``): n evenly spaced
    frames picked from the movi list, timestamps from the container's
    own frame rate. Other payloads keep the deterministic slice fake so
    the fan-out plumbing stays exercised; inter-frame codecs would need
    ffmpeg and raise inside the demuxer. One input row → n output rows,
    the real fan-out shape."""
    import pandas as pd

    from data_timeseries_java_spark.functions.avi import (
        avi_header_stats,
        decode_avi_frames,
    )

    def _frames(payload: bytes):
        if payload is None:
            raise NotImplementedError("real codec required")
        if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
            all_frames = decode_avi_frames(payload)
            _w, _h, _n, fps = avi_header_stats(payload)
            step_ms = 1000 // max(fps, 1)
            # n evenly spaced picks (nearest-index sampling, like
            # resize_nearest does spatially)
            idx = [(k * len(all_frames)) // n_frames
                   for k in range(n_frames)]
            return [(all_frames[i], i * step_ms) for i in idx]
        step = max(1, len(payload) // n_frames)
        return [(payload[i * step:(i + 1) * step] or payload[-step:],
                 i * frame_interval_ms)
                for i in range(n_frames)]

    def run(batches):
        for pdf in batches:
            rows = [
                (mid, i, ts, fr)
                for mid, payload in zip(pdf["media_id"], pdf["payload"])
                for i, (fr, ts) in enumerate(_frames(payload))
            ]
            yield pd.DataFrame(rows, columns=[
                "media_id", "frame_idx", "frame_ts_ms", "frame"])

    return media.mapInPandas(run, FRAMES_SCHEMA)


WAV_MEDIA_SCHEMA = "media_id long, payload binary"
AUDIO_FEATURES_SCHEMA = ("media_id long, sample_rate int, channels int, "
                         "n_samples int, mean_amp double, rms double, "
                         "zero_crossings int")


def synthesize_wav_media(ids: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Deterministic REAL WAV payload per id (spec-conformant RIFF PCM16
    via ``encode_wav``), with a closed-form sample recipe an external
    oracle can verify:

        offset     d = id % 50
        amplitude  a = 100 + id % 100      (a > d, so the sign always
                                            alternates)
        samples    x[i] = d + a (even i) / d - a (odd i)
        n          = 2 * (32 + id % 64)    (even → exact integer moments)
        rate       = 8000 + 1000 * (id % 3)

    The alternating square wave makes every audio feature closed-form:
    mean = d, mean square = d² + a² (both exact — n is even), and the
    signal crosses zero between every pair of samples (n - 1 sign
    changes)."""
    import numpy as np
    import pandas as pd

    from data_timeseries_java_spark.functions.wav import encode_wav

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            payloads = []
            for mid in pdf[id_col]:
                i = int(mid)
                d, a = i % 50, 100 + i % 100
                n = 2 * (32 + i % 64)
                rate = 8000 + 1000 * (i % 3)
                x = np.full(n, d, dtype=np.int16)
                x[0::2] += a
                x[1::2] -= a
                payloads.append(encode_wav(x, rate))
            yield pd.DataFrame({"media_id": pdf[id_col].astype("int64"),
                                "payload": payloads})

    return _spread(ids).mapInPandas(run, WAV_MEDIA_SCHEMA)


def audio_features(media: DataFrame) -> DataFrame:
    """Decode WAV payloads and extract waveform features (channel-mean
    amplitude, RMS, zero-crossing count) via mapInPandas — REAL sample
    arithmetic on the decoded PCM array, Arrow-batched like the image
    tier. Floats are rounded floor(x·10⁶ + 0.5)/10⁶ so an external SQL
    oracle reproduces them bit-for-bit (same contract as the JPEG
    codec's rounding)."""
    import numpy as np
    import pandas as pd

    from data_timeseries_java_spark.functions.wav import decode_wav

    def _r6(x: float) -> float:
        return float(np.floor(x * 1_000_000 + 0.5) / 1_000_000)

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                samples, rate = decode_wav(payload)
                n, ch = samples.shape
                mono = samples.astype(np.float64).mean(axis=1)
                mean = float(mono.mean())
                rms = float(np.sqrt(np.mean(mono * mono)))
                zc = int(np.count_nonzero(mono[:-1] * mono[1:] < 0))
                rows.append((int(mid), rate, ch, n,
                             _r6(mean), _r6(rms), zc))
            yield pd.DataFrame(rows, columns=[
                "media_id", "sample_rate", "channels", "n_samples",
                "mean_amp", "rms", "zero_crossings"])

    return media.mapInPandas(run, AUDIO_FEATURES_SCHEMA)


SPECTRUM_SCHEMA = ("media_id long, sample_rate int, n_samples int, "
                   "dc_mag double, dominant_bin int, dominant_mag double, "
                   "spectral_centroid double")


def audio_spectrum(media: DataFrame) -> DataFrame:
    """REAL frequency-domain features: decode PCM, run an rFFT on the
    channel-mean signal, and emit DC magnitude, the dominant non-DC bin
    (index + magnitude), and the magnitude-weighted spectral centroid in
    Hz over the non-DC bins. Floats round floor(x·10⁶ + 0.5)/10⁶ (the
    codec tier's oracle contract); numerically-zero bins (~1e-13 from
    exact-integer signals) vanish under that rounding, which is what
    makes a closed-form fixture spectrum externally checkable."""
    import numpy as np
    import pandas as pd

    from data_timeseries_java_spark.functions.wav import decode_wav

    def _r6(x: float) -> float:
        return float(np.floor(x * 1_000_000 + 0.5) / 1_000_000)

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                x, rate = decode_wav(payload)
                mono = x.astype(np.float64).mean(axis=1)
                n = len(mono)
                mag = np.abs(np.fft.rfft(mono)) / n
                freqs = np.arange(len(mag)) * (rate / n)
                k = int(np.argmax(mag[1:])) + 1 if len(mag) > 1 else 0
                tail = mag[1:]
                centroid = (float((freqs[1:] * tail).sum() / tail.sum())
                            if len(tail) and tail.sum() > 0 else 0.0)
                rows.append((int(mid), rate, n, _r6(float(mag[0])), k,
                             _r6(float(mag[k])), _r6(centroid)))
            yield pd.DataFrame(rows, columns=[
                "media_id", "sample_rate", "n_samples", "dc_mag",
                "dominant_bin", "dominant_mag", "spectral_centroid"])

    return media.mapInPandas(run, SPECTRUM_SCHEMA)


RAMP_WAV_SCHEMA = "media_id long, payload binary, target_rate int"
RESAMPLE_SCHEMA = ("media_id long, src_rate int, target_rate int, "
                   "n_in int, n_out int, resampled_sum long")


def synthesize_ramp_wav_media(ids: DataFrame,
                              id_col: str = "media_id") -> DataFrame:
    """Deterministic REAL WAV per id carrying a LINEAR RAMP — the
    fixture whose linear-interpolation resample is closed-form:

        base   b = id % 40
        slope  s = 1 + id % 3
        x[i]   = b + s*i            (int16, max 40 + 3*79 < 2^15)
        n_in   = 48 + id % 32
        src    = 8000 Hz;  target = 4000 + 1000 * (id % 5)

    Linear interpolation of a linear ramp at position p is exactly
    b + s*p, so every resampled sample — and therefore the round-trip
    sum — is SQL-expressible (``queries/multimodal.py``
    media_wav_resample oracle)."""
    import numpy as np
    import pandas as pd

    from data_timeseries_java_spark.functions.wav import encode_wav

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            payloads, targets = [], []
            for mid in pdf[id_col]:
                i = int(mid)
                b, s = i % 40, 1 + i % 3
                n = 48 + i % 32
                x = (b + s * np.arange(n)).astype(np.int16)
                payloads.append(encode_wav(x, 8000))
                targets.append(4000 + 1000 * (i % 5))
            yield pd.DataFrame({"media_id": pdf[id_col].astype("int64"),
                                "payload": payloads,
                                "target_rate": pd.Series(targets,
                                                         dtype="int32")})

    return _spread(ids).mapInPandas(run, RAMP_WAV_SCHEMA)


def resample_audio(media: DataFrame,
                   target_col: str = "target_rate") -> DataFrame:
    """REAL sample-rate conversion: decode PCM, linear-interpolate each
    channel onto the target-rate time grid (position of output sample j
    is ``j * src/target`` in input samples; output length keeps every
    position inside the input: ``(n_in-1)*target//src + 1``), quantize
    round-half-up to int16, re-encode as WAV at the target rate, decode
    the round-trip and emit its sample sum — certifying interpolate +
    encode + decode on genuine PCM data. The training-pipeline shape:
    audio corpora are normalized to one rate before feature extraction;
    per-payload Python cost rides the same Arrow-batched ``mapInPandas``
    lane (and decoder seam) as the image tier."""
    import numpy as np
    import pandas as pd

    from data_timeseries_java_spark.functions.wav import (
        decode_wav, encode_wav)

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for mid, payload, tgt in zip(pdf["media_id"], pdf["payload"],
                                         pdf[target_col]):
                x, src = decode_wav(payload)
                tgt = int(tgt)
                n_in, ch = x.shape
                n_out = (n_in - 1) * tgt // src + 1
                pos = np.arange(n_out) * (src / tgt)
                i0 = np.floor(pos).astype(np.int64)
                frac = pos - i0
                i1 = np.minimum(i0 + 1, n_in - 1)
                xf = x.astype(np.float64)
                y = xf[i0] + (xf[i1] - xf[i0]) * frac[:, None]
                yq = np.floor(y + 0.5).astype(np.int16)
                rt, rrate = decode_wav(encode_wav(yq, tgt))
                assert rrate == tgt
                rows.append((int(mid), src, tgt, n_in, n_out,
                             int(rt.astype(np.int64).sum())))
            yield pd.DataFrame(rows, columns=[
                "media_id", "src_rate", "target_rate",
                "n_in", "n_out", "resampled_sum"])

    return media.mapInPandas(run, RESAMPLE_SCHEMA)


AVI_MEDIA_SCHEMA = "media_id long, payload binary"
FRAME_STATS_SCHEMA = ("media_id long, frame_idx int, width int, "
                      "height int, pixel_sum long")


def synthesize_avi_media(ids: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Deterministic REAL video payload per id: a spec-conformant
    Motion-JPEG AVI (``functions/avi.py``) whose frames are baseline
    JPEGs from ``encode_jpeg``, with a closed-form recipe:

        width    = 8 + id % 9           (8..16)
        height   = 6 + id % 5           (6..10)
        n_frames = 2 + id % 4           (2..5)
        frame f  = constant gray, value (id + 17*f) % 256

    Constant gray at quality 75 round-trips bit-exact (see
    synthesize_jpeg_pixel_media), so every frame's pixel_sum is
    closed-form in (id, f) and an external oracle can verify genuine
    demux + entropy decode of a real video container."""
    import numpy as np
    import pandas as pd

    from data_timeseries_java_spark.functions.avi import encode_avi_mjpeg
    from data_timeseries_java_spark.functions.jpeg import encode_jpeg

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            payloads = []
            for mid in pdf[id_col]:
                i = int(mid)
                w, h, nf = 8 + i % 9, 6 + i % 5, 2 + i % 4
                frames = [encode_jpeg(
                    np.full((h, w), (i + 17 * f) % 256, dtype=np.uint8),
                    quality=75) for f in range(nf)]
                payloads.append(encode_avi_mjpeg(frames, w, h, fps=10))
            yield pd.DataFrame({"media_id": pdf[id_col].astype("int64"),
                                "payload": payloads})

    return _spread(ids).mapInPandas(run, AVI_MEDIA_SCHEMA)


def video_frame_stats(media: DataFrame,
                      decoder: Optional[ImageDecoder] = None,
                      fanout: Optional[int] = None) -> DataFrame:
    """REAL video path: demux the AVI movi list, decode every MJPEG
    frame with the baseline JPEG codec, and emit per-frame pixel stats.

    Round 15 (guide §4: shape the Python boundary for the expensive
    step): with ``fanout=N`` demux and decode run as SEPARATE stages
    with a keyed repartition between them. Demux is byte re-slicing —
    the movi list is scanned once and each frame's JPEG bytes become
    their own row — cheap per container; entropy decode is the
    expensive step, and spreading FRAMES (not containers) across N
    partitions means one multi-thousand-frame file no longer
    serializes its whole decode into a single task — the 100 TB media
    posture, exercised by bench_media.py's fan-out row and pinned
    row-identical by test_video_frame_stats_fanout_identical. The
    repartition key is deterministic (hash of (media_id, frame_idx)),
    never rand(), so task retries reproduce the same placement (guide
    §2.5). ``fanout=None`` (default) keeps the fused one-stage demux+
    decode: at bench SF the frame stream is a few hundred KB, the
    exchange + second Python hop measured +0.34 s/trial of pure
    overhead (interleaved A/B, r15), and chaining two mapInPandas
    phases inside ONE task (the exchange-free split) measured
    intermittent multi-second Python-runner stalls — the fused cost
    model is right until per-file frame counts dwarf the task count.
    Results are identical either way: (media_id, frame_idx) keys each
    frame and pixel stats are per-frame pure functions. ``decoder``
    swaps the per-frame JPEG codec (see module docstring)."""
    import numpy as np
    import pandas as pd

    from data_timeseries_java_spark.functions.avi import decode_avi_frames
    from data_timeseries_java_spark.functions.jpeg import decode_jpeg

    dec = decoder or decode_jpeg

    def fused(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                for fi, frame in enumerate(decode_avi_frames(payload)):
                    px = dec(frame)
                    h, w, _ch = px.shape
                    rows.append((int(mid), fi, w, h,
                                 int(px.sum(dtype=np.int64))))
            yield pd.DataFrame(rows, columns=[
                "media_id", "frame_idx", "width", "height", "pixel_sum"])

    if not fanout:
        return media.mapInPandas(fused, FRAME_STATS_SCHEMA)

    def demux(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                for fi, frame in enumerate(decode_avi_frames(payload)):
                    rows.append((int(mid), fi, frame))
            yield pd.DataFrame(rows, columns=[
                "media_id", "frame_idx", "frame"])

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for mid, fi, frame in zip(pdf["media_id"], pdf["frame_idx"],
                                      pdf["frame"]):
                px = dec(frame)
                h, w, _ch = px.shape
                rows.append((int(mid), int(fi), w, h,
                             int(px.sum(dtype=np.int64))))
            yield pd.DataFrame(rows, columns=[
                "media_id", "frame_idx", "width", "height", "pixel_sum"])

    frames = media.mapInPandas(
        demux, "media_id long, frame_idx int, frame binary")
    return (frames.repartition(fanout, "media_id", "frame_idx")
            .mapInPandas(decode, FRAME_STATS_SCHEMA))
