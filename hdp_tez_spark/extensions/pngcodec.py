"""Minimal stdlib PNG codec: `struct` + `zlib` + numpy, no imaging
library.

This is the fallback pixel path for `multimodal.resize_images` in
environments without PIL (like this container): PNG scanlines are plain
zlib-deflate behind per-row filters, so a correct decode/encode needs
nothing beyond the stdlib — the same toolkit the multimodal header
parser already uses for dimensions. With PIL present the operator
prefers it (full format coverage, C-speed filters); this module keeps
the semantics REAL — decoded pixels, resized pixels, re-encoded PNG —
rather than a NotImplementedError stub, for the one format whose spec
is small enough to implement honestly.

Coverage: 8-bit depth, grayscale / RGB / RGBA (color types 0, 2, 6),
non-interlaced — what PNG encoders emit by default for photos and
sprites. All five scanline filters (None/Sub/Up/Average/Paeth) decode;
the encoder emits filter 0 (deterministic output bytes: fixed filter,
fixed zlib level). Filters 1/3/4 unfilter in per-pixel Python — fine
for the small-image fallback; volume pixel work belongs to a real
imaging library.

Format reference: W3C PNG spec / RFC 2083 (public). Reference-parity
note: the reference engine treats media as opaque bytes + external
codecs (SURVEY §2.11); this fallback exists so the Spark-side resize
semantics are exercisable end-to-end in codec-less CI.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

SIGNATURE = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 6: 4}
_COLOR_TYPE = {1: 0, 3: 2, 4: 6}


def is_png(data: bytes) -> bool:
    return bytes(data[:8]) == SIGNATURE


def decode(data: bytes) -> np.ndarray:
    """PNG bytes -> (height, width, channels) uint8 array."""
    data = bytes(data)
    if not is_png(data):
        raise ValueError("not a PNG (bad signature)")
    pos, idat = 8, []
    w = h = depth = ctype = interlace = None
    while pos + 8 <= len(data):
        ln, typ = struct.unpack(">I4s", data[pos : pos + 8])
        pos += 8
        chunk = data[pos : pos + ln]
        pos += ln + 4  # payload + CRC (CRC not verified: codec, not validator)
        if typ == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", chunk
            )
        elif typ == b"IDAT":
            idat.append(chunk)
        elif typ == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    if depth != 8 or ctype not in _CHANNELS or interlace:
        raise ValueError(
            f"unsupported PNG variant (depth={depth} color_type={ctype} "
            f"interlace={interlace}); fallback codec covers 8-bit "
            "gray/RGB/RGBA non-interlaced"
        )
    c = _CHANNELS[ctype]
    stride = w * c
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline data has wrong length")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        base = y * (stride + 1)
        filt = raw[base]
        row = np.frombuffer(
            raw[base + 1 : base + 1 + stride], dtype=np.uint8
        ).copy()
        if filt == 0:  # None
            rec = row
        elif filt == 2:  # Up — vectorized (uint8 addition wraps mod 256)
            rec = row + prev
        elif filt == 1:  # Sub
            rec = row
            for x in range(c, stride):
                rec[x] = (int(rec[x]) + int(rec[x - c])) & 0xFF
        elif filt == 3:  # Average
            rec = row
            for x in range(stride):
                left = int(rec[x - c]) if x >= c else 0
                rec[x] = (int(rec[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif filt == 4:  # Paeth
            rec = row
            for x in range(stride):
                a = int(rec[x - c]) if x >= c else 0
                b = int(prev[x])
                cc = int(prev[x - c]) if x >= c else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                rec[x] = (int(rec[x]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter byte {filt}")
        out[y] = rec
        prev = out[y]
    return out.reshape(h, w, c)


def encode(arr: np.ndarray) -> bytes:
    """(height, width, channels) uint8 array -> PNG bytes (filter 0,
    zlib level 6 — deterministic for identical input)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    if c not in _COLOR_TYPE:
        raise ValueError(f"unsupported channel count {c} (1, 3 or 4)")
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))

    def chunk(typ: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + typ
            + payload
            + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR_TYPE[c], 0, 0, 0)
    return (
        SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def resize_nearest(arr: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Nearest-neighbor resize to (tw, th) — deterministic integer
    source indexing (floor of the proportional coordinate)."""
    h, w = arr.shape[:2]
    ys = (np.arange(th) * h) // th
    xs = (np.arange(tw) * w) // tw
    return arr[ys][:, xs]
