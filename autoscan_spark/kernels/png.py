"""Dependency-free baseline PNG codec (stdlib ``zlib`` + numpy).

Decoder: 8-bit-depth, non-interlaced PNG — color types 0 (gray),
2 (RGB), 3 (palette, incl. tRNS → RGBA), 4 (gray+alpha), 6 (RGBA) — with
full Sub/Up/Average/Paeth unfiltering and per-chunk CRC verification.
Encoder: the same color shapes, any single filter type 0-4 (the encoder
exists so tests can roundtrip every unfilter path without fixtures).

Scope gates (honest ``NotImplementedError``): bit depths other than 8,
Adam7 interlacing, and 16-bit channels. Corrupt streams (bad magic, bad
CRC, truncated chunks, inflate errors, short pixel data) raise
``ValueError`` — the per-row error discipline ``operators.multimodal``
relies on, mirroring ``kernels.jpeg``.

Everything here derives from the public PNG spec (RFC 2083 / ISO 15948);
the reference repo has no image codec — this supports the multimodal
column operators only.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# color type → samples per pixel (bit depth 8 ⇒ bytes per pixel)
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (PNG spec §6.6): nearest of left/up/upper-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _iter_chunks(payload: bytes):
    pos = len(_SIGNATURE)
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        if len(body) != length or pos + 12 + length > len(payload):
            raise ValueError(f"truncated PNG chunk {ctype!r}")
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        yield ctype, body
        pos += 12 + length
        if ctype == b"IEND":
            return
    raise ValueError("PNG stream ended without IEND")


def _unfilter(raw: bytes, h: int, w: int, bpp: int) -> np.ndarray:
    """Reverse per-scanline filtering → uint8 array (h, w*bpp)."""
    stride = w * bpp
    if len(raw) != h * (stride + 1):
        raise ValueError(
            f"PNG pixel data {len(raw)}B != expected {h * (stride + 1)}B"
        )
    lines = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ftype = int(lines[y, 0])
        row = lines[y, 1:]
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if ftype == 0:  # None
            out[y] = row
        elif ftype == 1:  # Sub — per-lane cumulative sum vectorizes it
            out[y] = np.cumsum(
                row.reshape(-1, bpp).astype(np.uint64), axis=0
            ).astype(np.uint8).reshape(stride)
        elif ftype == 2:  # Up — fully vectorized against the prior row
            out[y] = row + prev
        elif ftype == 3:  # Average — left-dependency forces a pixel walk
            cur = out[y]
            for i in range(stride):
                left = int(cur[i - bpp]) if i >= bpp else 0
                cur[i] = (int(row[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = out[y]
            for i in range(stride):
                left = int(cur[i - bpp]) if i >= bpp else 0
                ul = int(prev[i - bpp]) if i >= bpp else 0
                cur[i] = (int(row[i]) + _paeth(left, int(prev[i]), ul)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
    return out


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes → uint8 array: (h, w) gray, (h, w, 2) gray+alpha,
    (h, w, 3) RGB, or (h, w, 4) RGBA (palette expands to RGB/RGBA)."""
    payload = bytes(payload)
    if payload[: len(_SIGNATURE)] != _SIGNATURE:
        raise ValueError("not a PNG payload")
    ihdr = None
    plte = trns = None
    idat = bytearray()
    for ctype, body in _iter_chunks(payload):
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            plte = body
        elif ctype == b"tRNS":
            trns = body
        elif ctype == b"IDAT":
            idat.extend(body)
    if ihdr is None:
        raise ValueError("PNG without IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError(f"bad IHDR compression/filter ({comp}/{filt})")
    if interlace == 1:
        raise NotImplementedError("Adam7-interlaced PNG not supported")
    if depth != 8:
        raise NotImplementedError(f"{depth}-bit PNG not supported (8 only)")
    if color not in _CHANNELS:
        raise ValueError(f"unknown PNG color type {color}")
    if w == 0 or h == 0:
        raise ValueError("zero-dimension PNG")
    bpp = _CHANNELS[color]
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise ValueError(f"PNG IDAT inflate failed: {exc}") from exc
    flat = _unfilter(raw, h, w, bpp)
    if color == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE chunk")
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = flat.reshape(h, w)
        if int(idx.max()) >= len(pal):
            raise ValueError("PNG palette index out of range")
        rgb = pal[idx]
        if trns is not None:
            alpha = np.full(len(pal), 255, dtype=np.uint8)
            alpha[: len(trns)] = np.frombuffer(trns, dtype=np.uint8)
            return np.dstack([rgb, alpha[idx]])
        return rgb
    if bpp == 1:
        return flat.reshape(h, w)
    return flat.reshape(h, w, bpp)


def _filter_row(row: np.ndarray, prev: np.ndarray, bpp: int, ftype: int) -> np.ndarray:
    left = np.zeros_like(row)
    left[bpp:] = row[:-bpp]
    if ftype == 0:
        return row
    if ftype == 1:
        return row - left
    if ftype == 2:
        return row - prev
    if ftype == 3:
        return row - ((left.astype(np.uint16) + prev.astype(np.uint16)) >> 1).astype(np.uint8)
    if ftype == 4:
        ul = np.zeros_like(prev)
        ul[bpp:] = prev[:-bpp]
        out = np.empty_like(row)
        for i in range(len(row)):
            out[i] = (int(row[i]) - _paeth(int(left[i]), int(prev[i]), int(ul[i]))) & 0xFF
        return out
    raise ValueError(f"unknown PNG filter type {ftype}")


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray, filter_type: int = 0, level: int = 6) -> bytes:
    """uint8 array → PNG bytes. Shapes: (h, w) gray, (h, w, 2) gray+alpha,
    (h, w, 3) RGB, (h, w, 4) RGBA. ``filter_type`` (0-4) applies one PNG
    filter to every scanline — the knob tests use to exercise each
    unfilter path."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        h, w, bpp, color = *arr.shape, 1, 0
    elif arr.ndim == 3 and arr.shape[2] in (2, 3, 4):
        h, w, bpp = arr.shape
        color = {2: 4, 3: 2, 4: 6}[bpp]
    else:
        raise ValueError(f"unsupported array shape {arr.shape}")
    if filter_type not in (0, 1, 2, 3, 4):
        raise ValueError(f"filter_type must be 0-4, got {filter_type}")
    flat = arr.reshape(h, w * bpp)
    lines = bytearray()
    prev = np.zeros(w * bpp, dtype=np.uint8)
    for y in range(h):
        lines.append(filter_type)
        lines.extend(_filter_row(flat[y], prev, bpp, filter_type).tobytes())
        prev = flat[y]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(lines), level))
        + _chunk(b"IEND", b"")
    )
