"""Pure-Python PNG codec (functions.png): spec-level round-trip tests.

No Spark needed — this is the data-plane codec the multimodal operators run
inside mapInPandas workers."""

from __future__ import annotations

import struct
import zlib

import pytest

from pyspark_mllib_twitter_spark.functions import png


def _pixels(w, h, c, seed=0):
    return bytes((seed + i * 7) % 256 for i in range(w * h * c))


@pytest.mark.parametrize("channels", [1, 3, 4])
def test_roundtrip(channels):
    w, h = 13, 9
    px = _pixels(w, h, channels, seed=channels)
    data = png.encode_png(w, h, px, channels)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    assert png.decode_png(data) == (w, h, channels, px)


def test_decode_handles_all_filter_types():
    """A conformant encoder may use any scanline filter; decode must invert
    Sub/Up/Average/Paeth, not just the filter-0 stream our encoder emits."""
    w, h, c = 8, 10, 3
    px = _pixels(w, h, c, seed=3)
    stride = w * c

    def paeth(a, b, cc):
        p = a + b - cc
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else cc)

    raw, prev = bytearray(), bytearray(stride)
    for y in range(h):
        line = bytearray(px[y * stride : (y + 1) * stride])
        f = y % 5
        enc = bytearray(stride)
        for i in range(stride):
            left = line[i - c] if i >= c else 0
            up = prev[i]
            ul = prev[i - c] if i >= c else 0
            pred = {0: 0, 1: left, 2: up, 3: (left + up) >> 1, 4: paeth(left, up, ul)}[f]
            enc[i] = (line[i] - pred) & 0xFF
        raw.append(f)
        raw += enc
        prev = line

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    assert png.decode_png(data) == (w, h, 3, px)


def test_corruption_detected():
    data = bytearray(png.encode_png(4, 4, _pixels(4, 4, 3), 3))
    with pytest.raises(ValueError, match="signature"):
        png.decode_png(b"JUNK" + bytes(data[4:]))
    data[40] ^= 0xFF  # flip a byte inside a chunk body → CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        png.decode_png(bytes(data))


def test_encode_validates_buffer_size():
    with pytest.raises(ValueError, match="expected"):
        png.encode_png(4, 4, b"\x00" * 5, 3)
    with pytest.raises(ValueError, match="channels"):
        png.encode_png(1, 1, b"\x00\x00", 2)


def test_resize_nearest_identity_and_downscale():
    w, h, c = 6, 4, 3
    px = _pixels(w, h, c)
    assert png.resize_nearest(w, h, c, px, w, h) == px
    half = png.resize_nearest(w, h, c, px, 3, 2)
    assert len(half) == 3 * 2 * c
    # nearest-neighbor: sampled pixels are taken from the source grid
    src = [px[i : i + c] for i in range(0, len(px), c)]
    out = [half[i : i + c] for i in range(0, len(half), c)]
    assert all(p in src for p in out)


def test_truncated_input_raises_value_error():
    """Truncated/corrupt input must raise the module's documented ValueError,
    never a low-level struct.error or zlib.error (callers route bad assets
    by catching ValueError)."""
    data = png.encode_png(4, 4, _pixels(4, 4, 3), 3)
    with pytest.raises(ValueError, match="truncated"):
        png.decode_png(data[: len(data) // 2])
    with pytest.raises(ValueError, match="truncated"):
        png.decode_png(data[:10])
