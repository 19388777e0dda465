"""Stdlib PNG codec unit tests (extensions/pngcodec.py).

The encoder only emits filter 0, so the decoder's filter coverage
(Sub/Up/Average/Paeth — what real encoders like PIL emit) is exercised
by forward-filtering known pixels here in the test, exactly per the
W3C spec, and asserting the decoder reconstructs them.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from hdp_tez_spark.extensions import pngcodec


def _rand_img(h, w, c, seed):
    return np.random.default_rng(seed).integers(
        0, 256, size=(h, w, c), dtype=np.uint8
    )


@pytest.mark.parametrize("channels", [1, 3, 4])
def test_encode_decode_round_trip(channels):
    img = _rand_img(13, 7, channels, seed=channels)
    out = pngcodec.decode(pngcodec.encode(img))
    assert out.shape == (13, 7, channels)
    assert (out == img).all()


def test_encode_is_deterministic():
    img = _rand_img(5, 5, 3, seed=9)
    assert pngcodec.encode(img) == pngcodec.encode(img)


def _forward_filter(img: np.ndarray, filt: int) -> bytes:
    """Apply one PNG filter type to every scanline (spec §6)."""
    h, w, c = img.shape
    stride = w * c
    flat = img.reshape(h, stride).astype(np.int32)
    out = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        row = flat[y]
        filtered = np.zeros(stride, dtype=np.int32)
        for x in range(stride):
            a = int(row[x - c]) if x >= c else 0
            b = int(prev[x])
            cc = int(prev[x - c]) if x >= c else 0
            if filt == 0:
                pred = 0
            elif filt == 1:
                pred = a
            elif filt == 2:
                pred = b
            elif filt == 3:
                pred = (a + b) >> 1
            else:  # Paeth
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
            filtered[x] = (int(row[x]) - pred) & 0xFF
        out.append(filt)
        out.extend(filtered.astype(np.uint8).tobytes())
        prev = row
    return bytes(out)


def _wrap_png(w, h, ctype, raw):
    def chunk(typ, payload):
        return (
            struct.pack(">I", len(payload))
            + typ
            + payload
            + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        pngcodec.SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("filt", [0, 1, 2, 3, 4])
def test_decoder_reconstructs_all_filter_types(filt):
    img = _rand_img(9, 6, 3, seed=100 + filt)
    png = _wrap_png(6, 9, 2, _forward_filter(img, filt))
    assert (pngcodec.decode(png) == img).all()


def test_resize_nearest_doubling_and_halving():
    img = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    up = pngcodec.resize_nearest(img, 8, 8)
    assert up.shape == (8, 8, 3)
    assert (up[::2, ::2] == img).all()  # each source pixel becomes 2x2
    down = pngcodec.resize_nearest(img, 2, 2)
    assert (down == img[::2, ::2]).all()


def test_unsupported_variants_error_clearly():
    img = _rand_img(3, 3, 3, seed=1)
    png16 = bytearray(pngcodec.encode(img))
    png16[24] = 16  # bit depth byte inside IHDR
    with pytest.raises(ValueError, match="unsupported PNG variant"):
        pngcodec.decode(bytes(png16))
    with pytest.raises(ValueError, match="bad signature"):
        pngcodec.decode(b"JFIF not a png")
