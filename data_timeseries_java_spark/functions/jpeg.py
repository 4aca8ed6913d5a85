"""Pure-Python baseline JPEG codec (ITU-T T.81, numpy-vectorized).

The container ships no PIL/libjpeg/ffmpeg, and the multimodal tier
needs a REAL pixel path for the majority image format of any web-scale
corpus — so, like ``functions/png.py``, the codec is implemented from
the public spec: baseline sequential DCT (SOF0), standard Annex K
quantization and Huffman tables, JFIF color space. The encoder writes
4:4:4 (no chroma subsampling — simplest spec-conformant stream); the
decoder additionally handles 2x1/1x2/2x2 sampling factors and restart
markers, i.e. the streams real encoders emit for photos. Progressive
(SOF2), arithmetic coding, and 12-bit precision raise
``NotImplementedError`` at the boundary — same contract as the PNG
codec's palette/interlace subset.

Everything heavy is numpy: the DCT/IDCT are one ``einsum`` over all
blocks, color conversion is array arithmetic; only the entropy coder
walks Python-level bits (fixture-sized images in tests; a production
deployment would swap this module for a native codec behind the same
``decode_image`` seam).

Rounding is floor(x + 0.5) ("round half up") EVERYWHERE — including
quantization — so decoded pixel values are closed-form expressible in
an external SQL oracle (DuckDB has no banker's-rounding guarantee for
numpy parity; FLOOR(x + 0.5) matches exactly).

Reference parity note: the reference repo has no image path at all
(its payloads are FX ticks); this module serves the multimodal
extension brief only.
"""

from __future__ import annotations

import struct
from functools import lru_cache

import numpy as np

# ---------------------------------------------------------------- tables

#: zig-zag scan order: ZIGZAG[i] = (row, col) of the i-th coefficient
_ZZ = [
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (4, 0), (3, 1), (2, 2), (1, 3), (0, 4), (0, 5),
    (1, 4), (2, 3), (3, 2), (4, 1), (5, 0), (6, 0), (5, 1), (4, 2),
    (3, 3), (2, 4), (1, 5), (0, 6), (0, 7), (1, 6), (2, 5), (3, 4),
    (4, 3), (5, 2), (6, 1), (7, 0), (7, 1), (6, 2), (5, 3), (4, 4),
    (3, 5), (2, 6), (1, 7), (2, 7), (3, 6), (4, 5), (5, 4), (6, 3),
    (7, 2), (7, 3), (6, 4), (5, 5), (4, 6), (3, 7), (4, 7), (5, 6),
    (6, 5), (7, 4), (7, 5), (6, 6), (5, 7), (6, 7), (7, 6), (7, 7),
]
_ZZ_FLAT = np.array([r * 8 + c for r, c in _ZZ])          # block index order
_UNZZ = np.argsort(_ZZ_FLAT)                              # inverse permutation

#: Annex K base quantization tables (luminance, chrominance), zig-zag order
_QL_BASE = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
]).reshape(8, 8)
_QC_BASE = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
]).reshape(8, 8)

# Annex K standard Huffman specs: (BITS[1..16], HUFFVAL)
_DC_L = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
         list(range(12)))
_DC_C = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
         list(range(12)))
_AC_L = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_AC_C = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])

# orthonormal DCT-II matrix: dct = C @ block @ C.T, idct = C.T @ coef @ C
_C = np.array([[np.sqrt((1.0 if u == 0 else 2.0) / 8.0)
                * np.cos((2 * x + 1) * u * np.pi / 16.0)
                for x in range(8)] for u in range(8)])


def _round_half_up(x: np.ndarray) -> np.ndarray:
    """floor(x + 0.5): deterministic, SQL-expressible (not banker's)."""
    return np.floor(x + 0.5)


def quality_scaled_tables(quality: int = 75) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling of the Annex K tables (public libjpeg
    formula): scale = 5000/q below 50 else 200 - 2q; entries clamped to
    [1, 255]. Returns (luma, chroma) 8x8 int arrays."""
    if not 1 <= quality <= 100:
        raise ValueError(f"quality {quality} outside [1, 100]")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    def s(base):
        q = (base.astype(np.int64) * scale + 50) // 100
        return np.clip(q, 1, 255)
    return s(_QL_BASE), s(_QC_BASE)


def _build_huffman(bits, values):
    """BITS/HUFFVAL → {symbol: (code, length)} per T.81 C.2."""
    out, code = {}, 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_huffman_lut(bits, values):
    """BITS/HUFFVAL → flat 2^16 lookup list: entry = (symbol << 5) |
    code_length for every 16-bit word that starts with that code, 0 for
    prefixes matching no code.  T.81 caps code length at 16, so one
     16-bit peek resolves any symbol; canonical Huffman is prefix-free,
    so the fill ranges never overlap.  Returned as a plain list —
    scalar indexing on a list is ~3x faster than on an ndarray, and the
    decode loop is pure scalar.  Memoized on the table spec: building
    the 64k table costs ~1 ms, which would dominate thumbnail-sized
    decodes, and real streams overwhelmingly ship the Annex K tables."""
    return _lut_cached(tuple(bits), tuple(values))


@lru_cache(maxsize=8)    # ~2 MB/entry as a Python list; 8 covers the 4
def _lut_cached(bits: tuple, values: tuple):    # Annex K tables twice over
    enc = _build_huffman(bits, values)
    lut = np.zeros(65536, dtype=np.int32)
    for sym, (code, ln) in enc.items():
        lo = code << (16 - ln)
        lut[lo:lo + (1 << (16 - ln))] = (sym << 5) | ln
    return lut.tolist()


def _build_ac_fast_lut(bits, values):
    """AC fast path (the libjpeg-style combined table): when a code's
    length + its value-bit count fit in 16 bits, ONE peek yields the
    fully-decoded token.  Entry packing:

        (total_bits << 26) | (typ << 24) | (run << 20) | (value + 32768)

    typ 0 = coefficient (value is the EXTENDed signed coefficient),
    1 = EOB, 2 = ZRL; entry 0 = fall back to the two-step path (long
    code, or value bits spilling past the 16-bit peek).  Built
    vectorized per symbol and memoized — real streams ship Annex K."""
    return _ac_fast_cached(tuple(bits), tuple(values))


@lru_cache(maxsize=8)    # same bound: varied adversarial custom tables
def _ac_fast_cached(bits: tuple, values: tuple):    # must not pin ~100 MB
    enc = _build_huffman(bits, values)
    lut = np.zeros(65536, dtype=np.int64)
    for sym, (code, ln) in enc.items():
        run, s = sym >> 4, sym & 0x0F
        lo = code << (16 - ln)
        span = 1 << (16 - ln)
        if sym == 0x00:                       # EOB
            lut[lo:lo + span] = (ln << 26) | (1 << 24) | 32768
        elif sym == 0xF0:                     # ZRL
            lut[lo:lo + span] = (ln << 26) | (2 << 24) | 32768
        elif s and ln + s <= 16:
            total = ln + s
            rem = 16 - total                  # don't-care tail bits
            vbits = np.arange(1 << s, dtype=np.int64)
            vals = np.where(vbits < (1 << (s - 1)),
                            vbits - (1 << s) + 1, vbits)   # EXTEND
            entries = (total << 26) | (run << 20) | (vals + 32768)
            idx = ((lo + (vbits << rem))[:, None]
                   + np.arange(1 << rem, dtype=np.int64)[None, :]).ravel()
            lut[idx] = np.repeat(entries, 1 << rem)
        # else: value bits spill past the peek — slow path (entry 0)
    return lut.tolist()


# ---------------------------------------------------------------- encoder

#: below this many blocks the scalar emitter beats the vectorized
#: scan's fixed numpy overhead (measured crossover; fixture-sized
#: thumbnails stay on the scalar path)
_SCALAR_ENCODE_CUTOFF = 32


@lru_cache(maxsize=8)
def _enc_table_dicts():
    return (_build_huffman(*_DC_L), _build_huffman(*_DC_C),
            _build_huffman(*_AC_L), _build_huffman(*_AC_C))


def _encode_scan_scalar(seq_coefs, seq_comp, seg_id) -> bytes:
    """Sequential reference emitter over the same interleaved block
    sequence as `_encode_scan` — byte-identical output, lower constant
    cost for thumbnail-sized images."""
    dcl, dcc, acl, acc_ = _enc_table_dicts()
    bw = _BitWriter()
    out = bytearray()
    n_comp = int(seq_comp.max()) + 1
    pred = [0] * n_comp
    cur_seg = 0
    for i in range(len(seq_coefs)):
        s = int(seg_id[i])
        if s != cur_seg:
            bw.flush()
            out += bw.out
            bw.out.clear()
            out += bytes((0xFF, 0xD0 + (s - 1) % 8))
            pred = [0] * n_comp
            cur_seg = s
        ci = int(seq_comp[i])
        _encode_block(bw, seq_coefs[i], pred, ci,
                      dcl if ci == 0 else dcc, acl if ci == 0 else acc_)
    bw.flush()
    out += bw.out
    return bytes(out)


@lru_cache(maxsize=8)
def _enc_table_arrays():
    """Annex K encode tables as (codes, lengths) int64 arrays indexed
    by symbol — (dc_luma, dc_chroma, ac_luma, ac_chroma) — so token
    lookup is one fancy-index over the whole token stream."""
    out = []
    for spec, size in ((_DC_L, 12), (_DC_C, 12), (_AC_L, 256), (_AC_C, 256)):
        enc = _build_huffman(*spec)
        codes = np.zeros(size, dtype=np.int64)
        lens = np.zeros(size, dtype=np.int64)
        for sym, (code, ln) in enc.items():
            codes[sym], lens[sym] = code, ln
        out.append((codes, lens))
    return tuple(out)


def _bit_size(v: np.ndarray) -> np.ndarray:
    """Vectorized T.81 F.1.2.1 size category: bit_length(|v|)."""
    return np.frexp(np.abs(v).astype(np.float64))[1].astype(np.int64)


def _pack_chunks(chunks: np.ndarray, lens: np.ndarray) -> bytes:
    """Concatenate variable-length bit chunks MSB-first into a
    byte-aligned stream: 1-bit padding (T.81 F.1.2.3) + FF00 byte
    stuffing.  The fill loops over BIT POSITION WITHIN A CHUNK (≤27
    iterations of whole-array ops), never over tokens."""
    if not len(lens):
        return b""
    offs = np.cumsum(lens) - lens
    total = int(offs[-1] + lens[-1])
    bits = np.ones(-(-total // 8) * 8, dtype=np.uint8)
    for i in range(int(lens.max())):
        m = lens > i
        bits[offs[m] + i] = (chunks[m] >> (lens[m] - 1 - i)) & 1
    by = np.packbits(bits)
    ffs = np.nonzero(by == 0xFF)[0]
    if len(ffs):
        by = np.insert(by, ffs + 1, 0)
    return by.tobytes()


def _encode_scan(seq_coefs: np.ndarray, seq_comp: np.ndarray,
                 seg_id: np.ndarray) -> bytes:
    """Entropy-code interleaved zig-zag blocks (T.81 F.1.2), fully
    vectorized.  Every token (DC, ZRL, AC coefficient, EOB) gets an
    ordering key (block, slot-within-block) — DC at slot 0, an AC
    coefficient at its zig-zag index, the ZRLs ahead of it at the
    positions of the 16-zero runs they stand for, EOB at 64 — so one
    lexsort reproduces the sequential emission order exactly.  Huffman
    code + magnitude bits are fused into one chunk per token and
    packed per restart segment (DC prediction resets at segment
    boundaries; RSTn markers cycle D0..D7)."""
    (dcl_c, dcl_l), (dcc_c, dcc_l), (acl_c, acl_l), (acc_c, acc_l) = \
        _enc_table_arrays()
    n = len(seq_coefs)
    # --- DC tokens: per-component, per-segment delta with reset
    dc = seq_coefs[:, 0]
    diff = np.empty(n, dtype=np.int64)
    for ci in range(int(seq_comp.max()) + 1):
        m = seq_comp == ci
        d = dc[m]
        seg = seg_id[m]
        first = np.ones(len(d), dtype=bool)
        if len(d) > 1:
            first[1:] = seg[1:] != seg[:-1]
        prev = np.empty_like(d)
        prev[0] = 0
        prev[1:] = d[:-1]
        diff[m] = np.where(first, d, d - prev)
    dc_size = _bit_size(diff)
    dc_bits = np.where(diff >= 0, diff, diff + (1 << dc_size) - 1)
    luma = seq_comp == 0
    dc_code = np.where(luma, dcl_c[dc_size], dcc_c[dc_size])
    dc_clen = np.where(luma, dcl_l[dc_size], dcc_l[dc_size])
    tok_block = [np.arange(n)]
    tok_slot = [np.zeros(n, dtype=np.int64)]
    tok_chunk = [(dc_code << dc_size) | dc_bits]
    tok_len = [dc_clen + dc_size]
    # --- AC coefficient tokens (+ preceding ZRLs) from the nonzeros
    bi, kk = np.nonzero(seq_coefs[:, 1:])
    k = kk + 1
    v = seq_coefs[bi, k]
    first_in_block = np.ones(len(bi), dtype=bool)
    if len(bi) > 1:
        first_in_block[1:] = bi[1:] != bi[:-1]
    prevk = np.empty_like(k)
    if len(k):
        prevk[0] = 0
        prevk[1:] = k[:-1]
    prevk = np.where(first_in_block, 0, prevk)
    run = k - prevk - 1
    size = _bit_size(v)
    rs = ((run % 16) << 4) | size
    vb = np.where(v >= 0, v, v + (1 << size) - 1)
    ac_luma = seq_comp[bi] == 0
    code = np.where(ac_luma, acl_c[rs], acc_c[rs])
    clen = np.where(ac_luma, acl_l[rs], acc_l[rs])
    tok_block.append(bi)
    tok_slot.append(k.astype(np.int64))
    tok_chunk.append((code << size) | vb)
    tok_len.append(clen + size)
    n_zrl = run // 16
    if n_zrl.any():
        rep = np.repeat(np.arange(len(bi)), n_zrl)
        ends = np.cumsum(n_zrl)
        j = np.arange(len(rep)) - np.repeat(ends - n_zrl, n_zrl)
        zb = bi[rep]
        tok_block.append(zb)
        tok_slot.append(prevk[rep] + 16 * (j + 1))
        z_luma = seq_comp[zb] == 0
        tok_chunk.append(np.where(z_luma, acl_c[0xF0], acc_c[0xF0]))
        tok_len.append(np.where(z_luma, acl_l[0xF0], acc_l[0xF0]))
    # --- EOB where the last nonzero AC lands before 63
    last_k = np.zeros(n, dtype=np.int64)
    if len(bi):
        np.maximum.at(last_k, bi, k)
    eob = np.nonzero(last_k < 63)[0]
    tok_block.append(eob)
    tok_slot.append(np.full(len(eob), 64, dtype=np.int64))
    e_luma = seq_comp[eob] == 0
    tok_chunk.append(np.where(e_luma, acl_c[0x00], acc_c[0x00]))
    tok_len.append(np.where(e_luma, acl_l[0x00], acc_l[0x00]))
    # --- order, then pack per restart segment
    block = np.concatenate(tok_block)
    order = np.lexsort((np.concatenate(tok_slot), block))
    chunks = np.concatenate(tok_chunk)[order]
    lens = np.concatenate(tok_len)[order]
    tseg = seg_id[block[order]]
    out = bytearray()
    bounds = np.nonzero(np.diff(tseg))[0] + 1
    start = 0
    for si, stop in enumerate(list(bounds) + [len(lens)]):
        if si:
            out += bytes((0xFF, 0xD0 + (si - 1) % 8))
        out += _pack_chunks(chunks[start:stop], lens[start:stop])
        start = stop
    return bytes(out)


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r, g, b = px[..., 0], px[..., 1], px[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.clip(_round_half_up(np.stack([y, cb, cr], axis=-1)), 0, 255)


def _ycbcr_to_rgb(px: np.ndarray) -> np.ndarray:
    y, cb, cr = px[..., 0], px[..., 1] - 128.0, px[..., 2] - 128.0
    out = np.empty(px.shape, dtype=np.float64)
    out[..., 0] = y + 1.402 * cr
    out[..., 1] = y - 0.344136 * cb - 0.714136 * cr
    out[..., 2] = y + 1.772 * cb
    out += 0.5
    np.floor(out, out)                       # round half up, in place
    return np.clip(out, 0, 255, out)


def _plane_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) float plane, H/W multiples of 8 → (n_blocks, 8, 8) in
    raster MCU order."""
    h, w = plane.shape
    return (plane.reshape(h // 8, 8, w // 8, 8)
            .transpose(0, 2, 1, 3).reshape(-1, 8, 8))


def _pad_edge(plane: np.ndarray) -> np.ndarray:
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


class _BitWriter:
    """Scalar MSB-first bit emitter with FF00 stuffing — the small-image
    encode path; `_encode_scan` is the vectorized equivalent and the
    two are asserted byte-identical in tests."""

    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            b = (self._acc >> self._n) & 0xFF
            self.out.append(b)
            if b == 0xFF:           # byte stuffing
                self.out.append(0x00)
        self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec


def _magnitude(v: int) -> tuple[int, int]:
    """value → (size category, offset bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    size = int(v if v > 0 else -v).bit_length()
    bits = v if v >= 0 else v + (1 << size) - 1
    return size, bits


def _encode_block(bw: "_BitWriter", zz: np.ndarray, pred: list, ci: int,
                  dc_tab: dict, ac_tab: dict) -> None:
    """Entropy-code one zig-zag block (DC delta + AC RLE) — T.81 F.1.2."""
    diff = int(zz[0]) - pred[ci]
    pred[ci] = int(zz[0])
    size, bits = _magnitude(diff)
    code, ln = dc_tab[size]
    bw.write(code, ln)
    if size:
        bw.write(bits, size)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab[0xF0]      # ZRL
            bw.write(code, ln)
            run -= 16
        size, bits = _magnitude(v)
        code, ln = ac_tab[(run << 4) | size]
        bw.write(code, ln)
        bw.write(bits, size)
        run = 0
        if k == last_nz:
            break
    if last_nz < 63:
        code, ln = ac_tab[0x00]          # EOB
        bw.write(code, ln)


def _downsample2(plane: np.ndarray) -> np.ndarray:
    """2x2 box average (round half up) — the chroma decimation step."""
    p = _pad_even(plane)
    return _round_half_up(
        (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2])
        / 4.0)


def _pad_even(plane: np.ndarray) -> np.ndarray:
    h, w = plane.shape
    return np.pad(plane, ((0, h % 2), (0, w % 2)), mode="edge")


def encode_jpeg(pixels: np.ndarray, quality: int = 75,
                subsample: bool = False,
                restart_interval: int = 0) -> bytes:
    """Encode (H, W) / (H, W, 1) gray or (H, W, 3) RGB uint8 to a
    baseline JFIF stream (SOF0, Annex K Huffman tables).

    ``subsample=True`` emits 4:2:0 (chroma decimated 2x2, Y sampling
    2x2) — the layout photo encoders actually produce; default 4:4:4.
    ``restart_interval`` > 0 inserts DRI/RSTn markers every N MCUs (the
    error-resilience feature streaming producers use). Both exist
    primarily so the decoder's real-stream paths are testable without a
    native encoder in the container."""
    px = np.asarray(pixels)
    if px.ndim == 3 and px.shape[2] == 1:
        px = px[..., 0]
    gray = px.ndim == 2
    if not gray and (px.ndim != 3 or px.shape[2] != 3):
        raise ValueError(f"unsupported pixel shape {px.shape}")
    h, w = px.shape[:2]
    if not (0 < w <= 0xFFFF and 0 < h <= 0xFFFF):
        raise ValueError(f"dims out of JPEG range: {w}x{h}")
    if gray:
        subsample = False            # single component: factors are 1x1
    ql, qc = quality_scaled_tables(quality)

    if gray:
        planes = [px.astype(np.float64)]
    else:
        ycc = _rgb_to_ycbcr(px.astype(np.float64))
        planes = [ycc[..., i] for i in range(3)]
        if subsample:
            planes = [planes[0], _downsample2(planes[1]),
                      _downsample2(planes[2])]

    # per-component quantized blocks in raster order + block-grid dims
    comp_coefs, comp_grid = [], []
    for ci, plane in enumerate(planes):
        q = ql if ci == 0 else qc
        if subsample and ci == 0:
            # Y plane pads to the 16-pixel MCU grid
            ph, pw = -plane.shape[0] % 16, -plane.shape[1] % 16
            padded = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
        else:
            padded = _pad_edge(plane)
        blocks = _plane_blocks(padded - 128.0)
        coefs = np.einsum("ux,nxy,vy->nuv", _C, blocks, _C)
        quant = _round_half_up(coefs / q).astype(np.int64)
        comp_coefs.append(quant.reshape(-1, 64)[:, _ZZ_FLAT])
        comp_grid.append((padded.shape[0] // 8, padded.shape[1] // 8))

    # interleave blocks into MCU emission order, then entropy-code the
    # whole scan in one vectorized pass (_encode_scan)
    ncp = len(planes)
    if not subsample:
        # one block per component per MCU; MCU grid == block grid
        n_b = comp_coefs[0].shape[0]
        seq_coefs = np.stack(comp_coefs, axis=1).reshape(-1, 64)
        seq_comp = np.tile(np.arange(ncp), n_b)
        mcu_of = np.repeat(np.arange(n_b), ncp)
    else:
        # 4:2:0 MCU: 4 Y blocks (2x2 raster) + Cb + Cr
        ybh, ybw = comp_grid[0]
        mcuy, mcux = ybh // 2, ybw // 2
        n_mcu = mcuy * mcux
        m = np.arange(n_mcu)
        my, mx = m // mcux, m % mcux
        y00 = (my * 2) * ybw + mx * 2
        cb = my * comp_grid[1][1] + mx
        seq_coefs = np.empty((n_mcu * 6, 64), dtype=np.int64)
        seq_coefs[0::6] = comp_coefs[0][y00]
        seq_coefs[1::6] = comp_coefs[0][y00 + 1]
        seq_coefs[2::6] = comp_coefs[0][y00 + ybw]
        seq_coefs[3::6] = comp_coefs[0][y00 + ybw + 1]
        seq_coefs[4::6] = comp_coefs[1][cb]
        seq_coefs[5::6] = comp_coefs[2][cb]
        seq_comp = np.tile(np.array([0, 0, 0, 0, 1, 2]), n_mcu)
        mcu_of = np.repeat(m, 6)
    seg_id = mcu_of // restart_interval if restart_interval \
        else np.zeros(len(mcu_of), dtype=np.int64)
    if len(seq_coefs) <= _SCALAR_ENCODE_CUTOFF:
        entropy = _encode_scan_scalar(seq_coefs, seq_comp, seg_id)
    else:
        entropy = _encode_scan(seq_coefs, seq_comp, seg_id)

    # ------- marker stream
    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")                               # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    zz_l = bytes(int(ql.reshape(-1)[_ZZ_FLAT][i]) for i in range(64))
    out += seg(0xDB, b"\x00" + zz_l)                           # DQT luma
    if not gray:
        zz_c = bytes(int(qc.reshape(-1)[_ZZ_FLAT][i]) for i in range(64))
        out += seg(0xDB, b"\x01" + zz_c)                       # DQT chroma
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        hv = 0x22 if (subsample and ci == 0) else 0x11
        sof += struct.pack(">BBB", ci + 1, hv, 0 if ci == 0 else 1)
    out += seg(0xC0, sof)                                      # SOF0
    def dht(cls, tid, spec):
        bits, vals = spec
        return seg(0xC4, bytes([cls << 4 | tid]) + bytes(bits) + bytes(vals))
    out += dht(0, 0, _DC_L) + dht(1, 0, _AC_L)
    if not gray:
        out += dht(0, 1, _DC_C) + dht(1, 1, _AC_C)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))  # DRI
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, sos)                                      # SOS
    out += entropy
    out += b"\xff\xd9"                                         # EOI
    return bytes(out)


# ---------------------------------------------------------------- decoder

def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline sequential JFIF stream → (H, W, C) uint8
    (C = 1 gray, 3 color). Handles 4:4:4 / 4:2:2 / 4:2:0 sampling and
    restart markers; raises NotImplementedError for progressive (SOF2),
    arithmetic coding, hierarchical and 12-bit streams, ValueError for
    malformed ones."""
    if data is None or data[:2] != b"\xff\xd8":
        raise NotImplementedError("not a JPEG payload")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}
    comps = None
    h_img = w_img = 0
    restart_interval = 0
    scan = None

    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"corrupt JPEG: expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:          # EOI
            break
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if pos + 2 > len(data):
            raise ValueError("truncated JPEG: segment header")
        seg_len = struct.unpack(">H", data[pos:pos + 2])[0]
        body = data[pos + 2:pos + seg_len]
        if len(body) != seg_len - 2:
            raise ValueError("truncated JPEG: segment body")
        if marker == 0xDB:          # DQT (possibly several per segment)
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                vals = np.frombuffer(body[b + 1:b + 65], dtype=np.uint8)
                tab = np.zeros(64, dtype=np.float64)
                tab[_ZZ_FLAT] = vals
                qtabs[tq] = tab.reshape(8, 8)
                b += 65
        elif marker == 0xC4:        # DHT (possibly several per segment)
            b = 0
            while b < len(body):
                cls, tid = body[b] >> 4, body[b] & 0x0F
                bits = list(body[b + 1:b + 17])
                n = sum(bits)
                vals = list(body[b + 17:b + 17 + n])
                htabs[(cls, tid)] = (tuple(bits), tuple(vals))
                b += 17 + n
        elif marker == 0xC0 or marker == 0xC1:   # SOF0/1 baseline
            prec, h_img, w_img, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG precision")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0xFF{marker:02X})")
        elif marker == 0xDD:        # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:        # SOS — entropy data follows
            ns = body[0]
            scan = []
            for i in range(ns):
                cs, tabs = body[1 + 2 * i], body[2 + 2 * i]
                scan.append((cs, tabs >> 4, tabs & 0x0F))
            pos += seg_len
            break
        pos += seg_len

    if comps is None or scan is None:
        raise ValueError("corrupt JPEG: missing SOF/SOS")
    for c in comps:
        if c["h"] not in (1, 2) or c["v"] not in (1, 2):
            raise NotImplementedError(
                f"sampling factors {c['h']}x{c['v']} unsupported")

    # collect entropy-coded bytes (unstuff FF00, stop at a real marker)
    # — vectorized: locate every 0xFF, classify its successor, cut at
    # the first real marker, then np.delete the stuffed/RST bytes
    tail = np.frombuffer(data, dtype=np.uint8, offset=pos)
    ff = np.nonzero(tail[:-1] == 0xFF)[0] if len(tail) > 1 else \
        np.empty(0, dtype=np.int64)
    succ = tail[ff + 1]
    stuffed = succ == 0x00
    rst = (succ >= 0xD0) & (succ <= 0xD7)
    real = np.nonzero(~stuffed & ~rst)[0]
    end = ff[real[0]] if len(real) else len(tail)
    keep_ff = ff[(ff < end) & stuffed]
    rst_ff = ff[(ff < end) & rst]
    # drop the 0x00 after each stuffed FF and both bytes of each RSTn
    drop = np.concatenate([keep_ff + 1, rst_ff, rst_ff + 1])
    drop = drop[drop < end]
    entropy = np.delete(tail[:end], drop).tobytes()
    # restart offsets in the unstuffed stream: RST position minus bytes
    # dropped before it
    if len(rst_ff):
        dropped_before = np.searchsorted(np.sort(drop), rst_ff)
        restarts = (rst_ff - dropped_before).tolist()
    else:
        restarts = []

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w_img + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h_img + 8 * vmax - 1) // (8 * vmax)

    # Entropy decode: LUT Huffman over an integer bit accumulator.  One
    # 16-bit peek resolves any code; value bits come from the same
    # accumulator.  The scalar walk only COLLECTS coefficients (scatter
    # lists) — un-zigzag, dequantize, IDCT and plane assembly all run
    # afterwards as one vectorized numpy pass per component.
    scan_by_comp = {cs: (td, ta) for cs, td, ta in scan}
    luts = []
    for c in comps:
        td, ta = scan_by_comp[c["id"]]
        dc_spec = htabs.get((0, td))
        ac_spec = htabs.get((1, ta))
        if dc_spec is None or ac_spec is None or c["tq"] not in qtabs:
            raise ValueError("corrupt JPEG: missing table for scan")
        luts.append((_build_huffman_lut(*dc_spec),
                     _build_huffman_lut(*ac_spec),
                     _build_ac_fast_lut(*ac_spec)))
    hv_counts = [c["h"] * c["v"] for c in comps]
    n_comp = len(comps)
    n_mcu = mcux * mcuy
    buf = entropy
    nbits_real = 8 * len(buf)
    buf += b"\x00" * 8                     # tail pad; overrun detected below
    dc_vals: list[list] = [[] for _ in comps]   # absolute DC per block
    ac_packed: list[list] = [[] for _ in comps]  # (block*64+k) << 16 | v
    bases = [0] * n_comp                   # running flat offset per comp
    pred = [0] * n_comp
    acc = nacc = bpos = 0
    restart_iter = iter(restarts)
    next_restart = next(restart_iter, None)
    try:
        for mcu_i in range(n_mcu):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                acc = nacc = 0
                if next_restart is not None:
                    bpos = next_restart
                    next_restart = next(restart_iter, None)
                pred = [0] * n_comp
            for ci in range(n_comp):
                dc_lut, ac_lut, ac_fast = luts[ci]
                dcs = dc_vals[ci]
                packed = ac_packed[ci]
                base = bases[ci]
                p = pred[ci]
                for _ in range(hv_counts[ci]):
                    while nacc < 16:
                        acc = (acc << 8) | buf[bpos]
                        bpos += 1
                        nacc += 8
                    e = dc_lut[(acc >> (nacc - 16)) & 0xFFFF]
                    if e == 0:
                        raise ValueError("invalid JPEG Huffman code")
                    s = e >> 5
                    nacc -= e & 31
                    if s:
                        while nacc < s:
                            acc = (acc << 8) | buf[bpos]
                            bpos += 1
                            nacc += 8
                        v = (acc >> (nacc - s)) & ((1 << s) - 1)
                        nacc -= s
                        if v < 1 << (s - 1):        # T.81 F.2.2.1 EXTEND
                            v += (-1 << s) + 1
                        p += v
                    dcs.append(p)
                    k = 1
                    while k < 64:
                        while nacc < 16:
                            acc = (acc << 8) | buf[bpos]
                            bpos += 1
                            nacc += 8
                        # fast path: one peek resolves code AND value
                        e = ac_fast[(acc >> (nacc - 16)) & 0xFFFF]
                        if e:
                            nacc -= e >> 26
                            typ = (e >> 24) & 3
                            if typ:
                                if typ == 2:        # ZRL
                                    k += 16
                                    continue
                                break               # EOB
                            k += (e >> 20) & 15
                            if k > 63:
                                raise ValueError(
                                    "corrupt JPEG: AC index > 63")
                            packed.append(((base + k) << 16)
                                          | ((e + 32768) & 0xFFFF))
                            k += 1
                            continue
                        # slow path: long code or value spills the peek
                        e = ac_lut[(acc >> (nacc - 16)) & 0xFFFF]
                        if e == 0:
                            raise ValueError("invalid JPEG Huffman code")
                        nacc -= e & 31
                        rs = e >> 5
                        s = rs & 0x0F
                        if s == 0:
                            if rs == 0xF0:          # ZRL
                                k += 16
                                continue
                            break                   # EOB
                        k += rs >> 4
                        if k > 63:
                            raise ValueError("corrupt JPEG: AC index > 63")
                        while nacc < s:
                            acc = (acc << 8) | buf[bpos]
                            bpos += 1
                            nacc += 8
                        v = (acc >> (nacc - s)) & ((1 << s) - 1)
                        nacc -= s
                        if v < 1 << (s - 1):
                            v += (-1 << s) + 1
                        packed.append(((base + k) << 16) | (v & 0xFFFF))
                        k += 1
                    base += 64
                    acc &= (1 << nacc) - 1
                bases[ci] = base
                pred[ci] = p
            if 8 * bpos - nacc > nbits_real:
                raise ValueError("truncated JPEG entropy stream")
    except IndexError:
        raise ValueError("truncated JPEG entropy stream") from None

    # vectorized reconstruction: scatter → un-zigzag → dequant → batched
    # IDCT (two broadcast matmuls over all blocks) → MCU-grid assembly
    full = []
    for ci, c in enumerate(comps):
        n = n_mcu * hv_counts[ci]
        zz = np.zeros((n, 64), dtype=np.float64)
        zz[:, 0] = dc_vals[ci]
        if ac_packed[ci]:
            pk = np.array(ac_packed[ci], dtype=np.int64)
            zz.reshape(-1)[pk >> 16] = \
                (pk & 0xFFFF).astype(np.uint16).astype(np.int16)
        coef = zz[:, _UNZZ].reshape(n, 8, 8) * qtabs[c["tq"]]
        pix = _C.T @ coef @ _C + 128.0
        ch, cv = c["h"], c["v"]
        j = np.arange(n)
        mcu, within = j // (ch * cv), j % (ch * cv)
        grid = np.empty((mcuy * cv, mcux * ch, 8, 8))
        grid[(mcu // mcux) * cv + within // ch,
             (mcu % mcux) * ch + within % ch] = pix
        pl = grid.transpose(0, 2, 1, 3).reshape(mcuy * cv * 8, mcux * ch * 8)
        # upsample to full resolution and crop
        ry, rx = vmax // cv, hmax // ch
        if ry > 1 or rx > 1:
            pl = np.repeat(np.repeat(pl, ry, axis=0), rx, axis=1)
        full.append(pl[:h_img, :w_img])

    if len(full) == 1:
        out = np.clip(_round_half_up(full[0]), 0, 255)
        return out.astype(np.uint8)[..., None]
    ycc = np.stack([np.clip(_round_half_up(p), 0, 255) for p in full],
                   axis=-1)
    return _ycbcr_to_rgb(ycc).astype(np.uint8)
