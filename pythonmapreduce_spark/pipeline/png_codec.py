"""Minimal lossless PNG codec on stdlib ``zlib`` + numpy (no third-party
image library) — the image tier's analog of the audio tier's stdlib
``wave`` codec.

Written from the public PNG specification (RFC 2083 / ISO 15948): a PNG
is the 8-byte signature followed by length-tagged CRC-checked chunks;
pixel data is zlib-compressed scanlines, each prefixed by one filter
byte (0 none, 1 sub, 2 up, 3 average, 4 paeth). Scope is exactly what
the engine produces and consumes:

- **encode**: 8-bit greyscale (colour type 0), RGB (2) and RGBA (6),
  filter-0 scanlines — the decoder's fully-vectorized fast path, and
  what ``multimodal.encode_image`` emits for the lossless round trip.
- **decode**: the same colour types, all five scanline filters (so
  foreign filter-optimized files decode too), CRC-verified chunks.
  No interlace, no palette, no 16-bit — those raise, they never
  corrupt silently.

Filters 1/3/4 carry a dependency along x, so general unfiltering is a
per-scanline loop; files from THIS encoder are all-filter-0 and decode
in one vectorized reshape (the hot path for ``image_resize``'s
encode→decode round trip at scale: payload bytes stay inside the
mapInPandas worker, nothing here ever shuffles).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}  # colour type -> samples per pixel


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray, level: int = 6) -> bytes:
    """Lossless PNG bytes for a (h, w) or (h, w, 3|4) uint8 array."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        h, w = arr.shape
        ctype = 0
    elif arr.ndim == 3 and arr.shape[2] in (3, 4):
        h, w, ch = arr.shape
        ctype = 2 if ch == 3 else 6
    else:
        raise ValueError(f"unsupported array shape {arr.shape}")
    if h == 0 or w == 0:
        raise ValueError("empty image")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    flat = arr.reshape(h, w * _CHANNELS[ctype])
    raw = np.hstack([np.zeros((h, 1), np.uint8), flat]).tobytes()
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, level))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter_row(
    ftype: int, row: np.ndarray, prev: np.ndarray, bpp: int
) -> np.ndarray:
    """Invert one scanline filter (spec §6.2-6.6). row/prev are uint8;
    arithmetic is mod-256 per spec."""
    if ftype == 0:
        return row.copy()
    if ftype == 2:  # up — vectorizable
        return (row.astype(np.int16) + prev).astype(np.uint8)
    out = np.empty_like(row)
    r = row.astype(np.int16)
    if ftype == 1:  # sub
        for i in range(len(row)):
            left = out[i - bpp] if i >= bpp else 0
            out[i] = (r[i] + left) & 0xFF
    elif ftype == 3:  # average
        for i in range(len(row)):
            left = int(out[i - bpp]) if i >= bpp else 0
            out[i] = (r[i] + ((left + int(prev[i])) >> 1)) & 0xFF
    elif ftype == 4:  # paeth
        for i in range(len(row)):
            left = int(out[i - bpp]) if i >= bpp else 0
            ul = int(prev[i - bpp]) if i >= bpp else 0
            out[i] = (r[i] + _paeth(left, int(prev[i]), ul)) & 0xFF
    else:
        raise ValueError(f"unknown scanline filter {ftype}")
    return out


def decode_png(payload: bytes) -> np.ndarray:
    """Decode PNG bytes to a uint8 ndarray ((h, w) for greyscale,
    (h, w, ch) for RGB/RGBA). CRC-verified; unsupported features raise
    NotImplementedError rather than mis-decode."""
    if payload[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    w = h = ch = None
    idat = bytearray()
    while pos + 12 <= len(payload):
        (ln,) = struct.unpack(">I", payload[pos : pos + 4])
        if pos + 12 + ln > len(payload):
            # A declared chunk length running past the buffer is corruption,
            # not an unsupported feature: ValueError per the contract (a bare
            # struct.unpack here would leak struct.error past callers
            # catching ValueError/NotImplementedError).
            raise ValueError("truncated chunk")
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack(">I", payload[pos + 8 + ln : pos + 12 + ln])
        if zlib.crc32(tag + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r} chunk")
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8:
                raise NotImplementedError(f"bit depth {depth} (only 8)")
            if interlace:
                raise NotImplementedError("Adam7 interlace")
            if comp or filt:
                raise ValueError("nonzero compression/filter method")
            if ctype not in _CHANNELS:
                raise NotImplementedError(f"colour type {ctype}")
            ch = _CHANNELS[ctype]
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if w is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = w * ch + 1
    if raw.size != h * stride:
        raise ValueError("scanline data size mismatch")
    rows = raw.reshape(h, stride)
    filters, data = rows[:, 0], rows[:, 1:]
    if not filters.any():
        out = data.copy()  # all filter 0: this encoder's files, vectorized
    else:
        out = np.empty_like(data)
        prev = np.zeros(w * ch, dtype=np.uint8)
        for y in range(h):
            out[y] = _unfilter_row(int(filters[y]), data[y], prev, ch)
            prev = out[y]
    return out.reshape(h, w) if ch == 1 else out.reshape(h, w, ch)
