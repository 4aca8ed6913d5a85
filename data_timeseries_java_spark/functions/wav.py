"""Pure-Python WAV (RIFF PCM) codec — the audio leg of the multimodal
tier.

Like PNG (``functions/png.py``) and baseline JPEG (``functions/jpeg.py``),
the container has no audio library, but RIFF/WAVE PCM is a public,
trivially specified container: a RIFF header, an ``fmt `` chunk, and
little-endian PCM frames. That is enough for a REAL codec for the
subset a training-data pipeline synthesizes and verifies: 8-bit
unsigned / 16-bit signed integer PCM, any channel count and sample
rate.

Compressed codecs a real deployment would hand to ffmpeg — IEEE float,
ADPCM, MP3-in-WAV, extensible GUID formats — raise
``NotImplementedError`` with the format tag named. Malformed/truncated
payloads of recognized WAV raise ``ValueError`` (same error contract as
the image codecs).

The reference repo has no audio path (payloads are FX ticks); this
serves the multimodal extension brief only.
"""

from __future__ import annotations

import struct

import numpy as np

WAV_MAGIC = b"RIFF"


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Encode (n,) or (n, channels) int16 PCM → a spec-conformant WAV
    byte stream (readable by any standard player/tooling)."""
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2 or arr.dtype != np.int16:
        raise ValueError(f"expected (n[, ch]) int16, got "
                         f"{arr.shape} {arr.dtype}")
    n, ch = arr.shape
    data = arr.astype("<i2").tobytes()
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, ch * 2, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _chunks(data: bytes):
    """Walk RIFF sub-chunks with bounds checks (ValueError on cuts)."""
    pos = 12
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        if pos + 8 + size > len(data):
            raise ValueError(
                f"truncated WAV: chunk {tag!r} declares {size} bytes but "
                f"only {len(data) - pos - 8} remain")
        yield tag, data[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)   # chunks are word-aligned


def wav_header_stats(data: bytes) -> tuple[int, int, int, int]:
    """(sample_rate, channels, bits_per_sample, n_samples) from the
    ``fmt ``/``data`` chunks alone — no sample decode (the cheap
    metadata pass, like png_header_stats/jpeg_header_stats)."""
    if data is None or data[:4] != WAV_MAGIC or data[8:12] != b"WAVE":
        raise NotImplementedError("not a WAV payload")
    fmt = None
    data_len = None
    for tag, body in _chunks(data):
        if tag == b"fmt ":
            if len(body) < 16:
                raise ValueError("corrupt WAV: short fmt chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif tag == b"data":
            data_len = len(body)
    if fmt is None or data_len is None:
        raise ValueError("corrupt WAV: missing fmt/data chunk")
    audio_fmt, ch, rate, _br, block, bits = fmt
    if audio_fmt != 1:
        raise NotImplementedError(
            f"WAV format tag {audio_fmt} needs a real audio codec "
            f"(only integer PCM is implemented)")
    if bits not in (8, 16):
        raise NotImplementedError(f"{bits}-bit PCM unsupported")
    if block != ch * bits // 8:
        raise ValueError(f"corrupt WAV: block align {block} != "
                         f"{ch * bits // 8}")
    if data_len % block != 0:
        raise ValueError(f"corrupt WAV: data length {data_len} not "
                         f"aligned to block size {block}")
    return rate, ch, bits, data_len // block


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode integer-PCM WAV → ((n, channels) int16 array, sample_rate).
    8-bit unsigned input is widened to int16 (x*256 - 32768, the
    standard mapping)."""
    rate, ch, bits, n = wav_header_stats(data)
    raw = None
    for tag, body in _chunks(data):
        if tag == b"data":
            raw = body
    if bits == 16:
        arr = np.frombuffer(raw, dtype="<i2").astype(np.int16)
    else:
        arr = (np.frombuffer(raw, dtype=np.uint8).astype(np.int32)
               * 256 - 32768).astype(np.int16)
    return arr.reshape(n, ch), rate
