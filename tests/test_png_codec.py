"""The stdlib PNG codec (pythonmapreduce_spark/pipeline/png_codec.py):
lossless round trips for the shapes the engine emits, spec-correct
decode of foreign filter-optimized scanlines, and loud rejection of
corruption and unsupported features (never a silent mis-decode)."""
from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from pythonmapreduce_spark.pipeline.png_codec import (
    _SIG,
    _chunk,
    _paeth,
    decode_png,
    encode_png,
)


def test_roundtrip_grey_rgb_rgba() -> None:
    rng = np.random.default_rng(7)
    for shape in [(1, 1), (3, 3), (6, 8), (511, 67), (1, 300)]:
        grid = rng.integers(0, 256, size=shape, dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(grid)), grid)
    for ch in (3, 4):
        img = rng.integers(0, 256, size=(5, 7, ch), dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(img)), img)


def _filtered_png(pixels: np.ndarray, ftypes: list[int]) -> bytes:
    """Hand-build a greyscale PNG whose scanlines use the given filter
    types, applying each filter FORWARD per the spec so decode must
    invert them (this is how filter-optimizing encoders write files)."""
    h, w = pixels.shape
    raw = bytearray()
    prev = np.zeros(w, dtype=np.int16)
    for y, ft in enumerate(ftypes):
        row = pixels[y].astype(np.int16)
        out = np.empty(w, dtype=np.int16)
        for i in range(w):
            left = int(row[i - 1]) if i >= 1 else 0
            up = int(prev[i])
            ul = int(prev[i - 1]) if i >= 1 else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = left
            elif ft == 2:
                pred = up
            elif ft == 3:
                pred = (left + up) >> 1
            else:
                pred = _paeth(left, up, ul)
            out[i] = (int(row[i]) - pred) & 0xFF
        raw.append(ft)
        raw.extend(out.astype(np.uint8).tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def test_decodes_all_five_foreign_filters() -> None:
    rng = np.random.default_rng(11)
    pixels = rng.integers(0, 256, size=(5, 9), dtype=np.uint8)
    png = _filtered_png(pixels, [0, 1, 2, 3, 4])
    assert np.array_equal(decode_png(png), pixels)
    # a file that is ALL non-zero filters (no vectorized fast path)
    png2 = _filtered_png(pixels, [4, 3, 2, 1, 4])
    assert np.array_equal(decode_png(png2), pixels)


def test_rejects_corruption_and_unsupported() -> None:
    grid = np.arange(12, dtype=np.uint8).reshape(3, 4)
    png = bytearray(encode_png(grid))
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"GIF89a" + bytes(png))
    # flip one IDAT byte -> CRC must catch it
    png[len(png) - 20] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(png))
    # 16-bit depth and interlace must raise NotImplementedError, not
    # silently mis-decode
    ihdr16 = struct.pack(">IIBBBBB", 4, 3, 16, 0, 0, 0, 0)
    png16 = _SIG + _chunk(b"IHDR", ihdr16) + _chunk(b"IDAT", zlib.compress(b"\0" * 27)) + _chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError, match="bit depth"):
        decode_png(png16)
    ihdr_i = struct.pack(">IIBBBBB", 4, 3, 8, 0, 0, 0, 1)
    png_i = _SIG + _chunk(b"IHDR", ihdr_i) + _chunk(b"IDAT", zlib.compress(b"\0" * 15)) + _chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError, match="interlace"):
        decode_png(png_i)
    with pytest.raises(ValueError):
        encode_png(np.zeros((0, 4), dtype=np.uint8))


def test_multi_idat_chunks_concatenate() -> None:
    # The spec allows the compressed stream split across several IDAT
    # chunks; decoders must concatenate before inflating.
    grid = np.arange(20, dtype=np.uint8).reshape(4, 5)
    comp = zlib.compress(
        np.hstack([np.zeros((4, 1), np.uint8), grid]).tobytes()
    )
    ihdr = struct.pack(">IIBBBBB", 5, 4, 8, 0, 0, 0, 0)
    png = (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", comp[:7])
        + _chunk(b"IDAT", comp[7:])
        + _chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(png), grid)


def test_truncated_payload_raises_valueerror_not_struct_error() -> None:
    # A truncated buffer or a chunk whose declared length runs past the
    # end must raise ValueError (corruption) per the docstring contract —
    # not leak struct.error from the CRC unpack (r10 ADVICE, low).
    png = encode_png(np.arange(12, dtype=np.uint8).reshape(3, 4))
    with pytest.raises(ValueError, match="truncated"):
        decode_png(png[:20])
    # a cut INSIDE the IDAT chunk (a cut that only clips the trailing
    # IEND leaves every pixel byte intact and decodes — tolerated)
    with pytest.raises(ValueError, match="truncated"):
        decode_png(png[:-20])
    # a lying length field: declared 2**24 bytes, buffer far shorter
    bad = png[:8] + struct.pack(">I", 1 << 24) + png[12:]
    with pytest.raises(ValueError, match="truncated"):
        decode_png(bad)
    # shorter than one whole chunk header after the signature -> the loop
    # never runs; still ValueError, not an index/struct error
    with pytest.raises(ValueError, match="missing IHDR"):
        decode_png(png[:15])
