"""Pure-Python PNG codec (stdlib ``zlib`` + numpy).

The container has no image library (no PIL), but PNG itself is public,
simple, and fully specified (RFC 2083): zlib-compressed scanlines, each
prefixed by one of five byte filters. That is enough to implement a
REAL codec — not a stub — for the subset a training-data pipeline
synthesizes and re-consumes: 8-bit grayscale / RGB / RGBA, non-interlaced.

``decode_png`` genuinely parses chunk structure, inflates IDAT, undoes
filters 0-4 (None/Sub/Up/Average/Paeth) and returns an (H, W, C) uint8
array. ``encode_png`` writes real, spec-conformant PNG bytes (readable
by any standard viewer) using Sub on the first row and Up on the rest,
so decoding always exercises the unfilter path.

Exotic inputs a real deployment would hand to libpng/ffmpeg — palette,
16-bit, interlaced PNG, JPEG, video — raise ``NotImplementedError``
with the sniffed format named, preserving the honest stub boundary.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
JPEG_MAGIC = b"\xff\xd8\xff"

# color type -> channels (8-bit, non-palette subset we own)
_CHANNELS = {0: 1, 2: 3, 6: 4}
_COLOR_TYPE = {1: 0, 3: 2, 4: 6}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def encode_png(pixels: np.ndarray) -> bytes:
    """Encode an (H, W) or (H, W, C) uint8 array as a real PNG.

    Deterministic: fixed zlib level, fixed filter choice (Sub for row 0,
    Up afterwards — rows usually resemble their neighbors, and it forces
    decoders through the arithmetic unfilter path, not just copy).
    """
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.ndim != 3 or arr.shape[2] not in _COLOR_TYPE:
        raise ValueError(f"expected (H,W,{{1,3,4}}) uint8, got {arr.shape}")
    h, w, ch = arr.shape
    bpp = ch  # bytes per pixel at bit depth 8
    raw = bytearray()
    prev = np.zeros((w, ch), dtype=np.uint8)
    for r in range(h):
        row = arr[r]
        if r == 0:
            # Sub: delta vs pixel to the left (first pixel vs zero)
            left = np.vstack([np.zeros((1, ch), np.uint8), row[:-1]])
            raw.append(1)
            raw.extend((row.astype(np.int16) - left).astype(np.uint8)
                       .tobytes())
        else:
            # Up: delta vs the row above
            raw.append(2)
            raw.extend((row.astype(np.int16) - prev.astype(np.int16))
                       .astype(np.uint8).tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR_TYPE[ch], 0, 0, 0)
    return (PNG_MAGIC
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
            + _chunk(b"IEND", b""))


def _unfilter(filt: int, cur: np.ndarray, prev: np.ndarray,
              bpp: int) -> np.ndarray:
    """Undo one scanline filter in place-ish; cur/prev are uint8 1-D."""
    if filt == 0:
        return cur
    if filt == 2:  # Up — vectorized, no sequential dependency
        return (cur.astype(np.int16) + prev.astype(np.int16)) \
            .astype(np.uint8)
    out = cur.astype(np.int32).copy()
    p32 = prev.astype(np.int32)
    n = out.shape[0]
    if filt == 1:  # Sub — left-to-right recurrence
        for i in range(bpp, n):
            out[i] = (out[i] + out[i - bpp]) & 0xFF
    elif filt == 3:  # Average
        for i in range(n):
            left = out[i - bpp] if i >= bpp else 0
            out[i] = (out[i] + ((left + p32[i]) >> 1)) & 0xFF
    elif filt == 4:  # Paeth
        for i in range(n):
            a = out[i - bpp] if i >= bpp else 0
            b = p32[i]
            c = p32[i - bpp] if i >= bpp else 0
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out[i] = (out[i] + pred) & 0xFF
    else:
        raise NotImplementedError(f"PNG filter type {filt}")
    return out.astype(np.uint8)


def decode_png(data: bytes) -> np.ndarray:
    """Decode 8-bit gray/RGB/RGBA non-interlaced PNG -> (H, W, C) uint8.

    Raises NotImplementedError for formats a real libpng/ffmpeg would
    own (palette/16-bit/interlaced PNG, JPEG, unknown magic).
    """
    if data is None or len(data) == 0:
        raise NotImplementedError("real codec required for empty payload")
    if data[:3] == JPEG_MAGIC:
        raise NotImplementedError("JPEG codec not available here")
    if data[:8] != PNG_MAGIC:
        raise NotImplementedError("unknown image format (not PNG)")
    pos, ihdr, idat = 8, None, bytearray()
    while pos + 8 <= len(data):
        (length,), tag = struct.unpack(">I", data[pos:pos + 4]), \
            data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, ctype, _comp, _filt, interlace = ihdr
    if depth != 8 or ctype not in _CHANNELS or interlace != 0:
        raise NotImplementedError(
            f"PNG subset not supported here: depth={depth} "
            f"color_type={ctype} interlace={interlace}")
    ch = _CHANNELS[ctype]
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = w * ch + 1
    if raw.size != h * stride:
        raise ValueError(f"PNG data size {raw.size} != {h}x{stride}")
    rows = raw.reshape(h, stride)
    out = np.empty((h, w * ch), dtype=np.uint8)
    prev = np.zeros(w * ch, dtype=np.uint8)
    for r in range(h):
        prev = _unfilter(int(rows[r, 0]), rows[r, 1:], prev, ch)
        out[r] = prev
    return out.reshape(h, w, ch)


def resize_nearest(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize of an (H, W, C) uint8 array — the classic
    index-sampling algorithm, fully vectorized (no Python pixel loop)."""
    h, w = pixels.shape[:2]
    ri = (np.arange(height) * h) // height
    ci = (np.arange(width) * w) // width
    return pixels[ri[:, None], ci[None, :]]
