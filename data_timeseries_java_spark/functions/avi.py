"""Pure-Python AVI (RIFF) container with MJPEG frames — the video leg
of the multimodal tier.

Motion-JPEG-in-AVI is the simplest REAL video format: a RIFF container
(same chunk grammar as WAV) whose ``movi`` list holds one complete JPEG
stream per frame. With the RIFF walker here and the baseline JPEG codec
(``functions/jpeg.py``) the engine can genuinely demux and decode video
frames with no native library — the honest boundary moves from "video
codec absent" to "inter-frame codecs (H.264 etc.) absent", which is
where it belongs: those genuinely need ffmpeg.

The writer emits a minimal but spec-conformant file (avih + one 'vids'
stream with an MJPG BITMAPINFOHEADER + movi + idx1), readable by
standard players. The reader walks chunks with bounds checks
(ValueError on truncation, same contract as the other codecs) and
accepts any MJPG/frame-chunk AVI, not just its own output.

The reference repo has no video path; this serves the multimodal
extension brief only.
"""

from __future__ import annotations

import struct

AVI_MAGIC = b"RIFF"


def _chunk(tag: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return tag + struct.pack("<I", len(body)) + body + pad


def _list(kind: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", kind + body)


def encode_avi_mjpeg(frames: list[bytes], width: int, height: int,
                     fps: int = 10) -> bytes:
    """Wrap complete JPEG byte streams as a Motion-JPEG AVI."""
    if not frames:
        raise ValueError("AVI needs at least one frame")
    n = len(frames)
    max_bytes = max(len(f) for f in frames)
    avih = struct.pack("<10I",
                       1_000_000 // fps,       # microseconds per frame
                       max_bytes * fps,        # max bytes per second
                       0,                      # padding granularity
                       0x10,                   # AVIF_HASINDEX
                       n, 0, 1, max_bytes,
                       width, height) + b"\x00" * 16
    strh = (b"vids" + b"MJPG"
            + struct.pack("<10I", 0, 0, 0, 1, fps, 0, n, max_bytes,
                          0xFFFFFFFF, 0)
            + struct.pack("<4H", 0, 0, width, height))
    strf = struct.pack("<I2i2H2I2i2I", 40, width, height, 1, 24,
                       struct.unpack("<I", b"MJPG")[0],
                       width * height * 3, 0, 0, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh)
                         + _chunk(b"strf", strf)))
    movi_body = b"".join(_chunk(b"00dc", f) for f in frames)
    movi = _list(b"movi", movi_body)
    # idx1: one entry per frame (offset relative to the 'movi' fourcc)
    idx = bytearray()
    off = 4
    for f in frames:
        idx += b"00dc" + struct.pack("<3I", 0x10, off, len(f))
        off += 8 + len(f) + (len(f) & 1)
    body = b"AVI " + hdrl + movi + _chunk(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk(data: bytes, pos: int, end: int):
    """Yield (tag, body_start, body_len) with bounds checks."""
    while pos + 8 <= end:
        tag = data[pos:pos + 4]
        size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        if pos + 8 + size > end:
            raise ValueError(
                f"truncated AVI: chunk {tag!r} declares {size} bytes but "
                f"only {end - pos - 8} remain")
        yield tag, pos + 8, size
        pos += 8 + size + (size & 1)


def avi_header_stats(data: bytes) -> tuple[int, int, int, int]:
    """(width, height, n_frames, fps) from the avih header alone."""
    if data is None or data[:4] != AVI_MAGIC or data[8:12] != b"AVI ":
        raise NotImplementedError("not an AVI payload")
    for tag, start, size in _walk(data, 12, len(data)):
        if tag == b"LIST" and data[start:start + 4] == b"hdrl":
            for t2, s2, z2 in _walk(data, start + 4, start + size):
                if t2 == b"avih":
                    if z2 < 40:
                        raise ValueError("corrupt AVI: short avih")
                    vals = struct.unpack("<10I", data[s2:s2 + 40])
                    usec, n, w, h = vals[0], vals[4], vals[8], vals[9]
                    fps = round(1_000_000 / usec) if usec else 0
                    return w, h, n, fps
    raise ValueError("corrupt AVI: missing avih header")


def decode_avi_frames(data: bytes) -> list[bytes]:
    """Demux the movi list → one complete JPEG byte stream per video
    frame chunk (``NNdc``/``NNdb``). Raises NotImplementedError when the
    frames are not JPEG (a non-MJPG fourcc would need ffmpeg)."""
    if data is None or data[:4] != AVI_MAGIC or data[8:12] != b"AVI ":
        raise NotImplementedError("not an AVI payload")
    frames: list[bytes] = []
    for tag, start, size in _walk(data, 12, len(data)):
        if tag == b"LIST" and data[start:start + 4] == b"movi":
            for t2, s2, z2 in _walk(data, start + 4, start + size):
                if t2[2:4] in (b"dc", b"db"):
                    frames.append(data[s2:s2 + z2])
    if not frames:
        raise ValueError("corrupt AVI: no frame chunks in movi list")
    for f in frames:
        if f[:2] != b"\xff\xd8":
            raise NotImplementedError(
                "AVI frames are not MJPEG — inter-frame codecs need a "
                "native decoder")
    return frames
