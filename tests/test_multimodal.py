"""Multimodal plumbing: REAL container-header decode (no codecs needed)
plus the deterministic fake-decode surface."""

from __future__ import annotations

import struct

import pytest

from hdp_tez_spark.extensions.multimodal import (
    _sniff_header,
    decode_meta,
    parse_media_headers,
    resize_images,
)


def _png(w, h):
    return b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\rIHDR" + struct.pack(">II", w, h) + b"\x08"


def _gif(w, h):
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00" * 6


def _bmp(w, h):
    return b"BM" + b"\x00" * 16 + struct.pack("<ii", w, h) + b"\x00" * 4


def _wav(byte_rate, data_size):
    fmt = b"fmt " + struct.pack("<I", 16) + struct.pack(
        "<HHIIHH", 1, 1, byte_rate, byte_rate, 1, 8
    )
    data = b"data" + struct.pack("<I", data_size) + b"\x00" * data_size
    body = b"WAVE" + fmt + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _jpeg(w, h):
    sof0 = b"\xff\xc0" + struct.pack(">H", 8 + 3) + b"\x08" + struct.pack(">HH", h, w)
    app0 = b"\xff\xe0" + struct.pack(">H", 4) + b"\x00\x00"
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def test_sniff_header_all_containers():
    assert _sniff_header(_png(640, 480)) == ("png", 640, 480, None)
    assert _sniff_header(_gif(320, 200)) == ("gif", 320, 200, None)
    assert _sniff_header(_bmp(800, -600)) == ("bmp", 800, 600, None)  # top-down BMP
    cont, w, h, dur = _sniff_header(_wav(16000, 32000))
    assert (cont, w, h) == ("wav", None, None) and dur == 2000  # 32000B / 16kBps
    assert _sniff_header(_jpeg(1920, 1080)) == ("jpeg", 1920, 1080, None)
    assert _sniff_header(b"not a media file") == (None, None, None, None)
    assert _sniff_header(b"") == (None, None, None, None)


def test_parse_media_headers_dataframe(spark):
    rows = [
        (1, _png(64, 32)),
        (2, _wav(8000, 8000)),
        (3, b"plain text payload"),
        (4, _jpeg(10, 20)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in parse_media_headers(df).collect()}
    assert (got[1].container, got[1].width, got[1].height) == ("png", 64, 32)
    assert (got[2].container, got[2].duration_ms) == ("wav", 1000)
    assert got[3].container is None and got[3].width is None
    assert (got[4].container, got[4].width, got[4].height) == ("jpeg", 10, 20)
    assert len(got) == 4  # unknown payloads keep their rows


def test_fake_decode_is_deterministic(spark):
    df = spark.createDataFrame(
        [(1, b"abc"), (2, b"abc"), (3, b"xyz")], "doc_id long, payload binary"
    )
    rows = {r.doc_id: (r.width, r.height, r.n_frames, r.modality)
            for r in decode_meta(df).collect()}
    assert rows[1] == rows[2]  # same payload -> same fake meta
    assert rows[1] != rows[3]


def test_resize_non_png_stubbed_without_codecs(spark):
    """A non-PNG payload in a codec-less environment hits the honest
    NotImplementedError (PNG goes through the stdlib fallback instead)."""
    from hdp_tez_spark.extensions.multimodal import HAVE_REAL_CODECS

    if HAVE_REAL_CODECS:
        pytest.skip("imaging library present — stub path not reachable")
    df = spark.createDataFrame([(1, b"abc")], "doc_id long, payload binary")
    with pytest.raises(Exception) as ei:
        resize_images(df).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_resize_png_pixel_path_end_to_end(spark):
    """REAL pixel round-trip with no imaging library (r08 task #6 —
    this was the suite's one skipped test): a generated two-tone 4x4
    PNG resizes to 8x8 through the engine, and the output payload
    decodes (stdlib codec) to the expected nearest-neighbor pixels.
    Runs on the PIL branch too when a library is present — the output
    contract (decodable PNG of target size) is branch-independent."""
    import numpy as np

    from hdp_tez_spark.extensions import pngcodec

    src = np.zeros((4, 4, 3), dtype=np.uint8)
    src[:2, :, :] = (250, 10, 10)   # top half red
    src[2:, :, :] = (10, 250, 10)   # bottom half green
    payload = pngcodec.encode(src)
    df = spark.createDataFrame(
        [(1, payload)], "doc_id long, payload binary"
    )
    row = resize_images(df, target=(8, 8)).collect()[0]
    assert (row.width, row.height) == (8, 8)
    out = pngcodec.decode(bytes(row.resized))
    assert out.shape == (8, 8, 3)
    from hdp_tez_spark.extensions.multimodal import HAVE_REAL_CODECS

    if not HAVE_REAL_CODECS:
        # stdlib branch is exact nearest-neighbor: the doubled image
        want = pngcodec.resize_nearest(src, 8, 8)
        assert (out == want).all()
    else:  # PIL bilinear: just check the two halves kept their hue
        assert out[0, 0, 0] > 200 and out[7, 0, 1] > 200


def test_synthesize_png_payloads_deterministic_and_real(spark):
    """Id-seeded payload synthesis (the q_image_resize input): identical
    bytes across runs (retry/executor stability) and genuinely decodable
    PNGs of the requested size."""
    from hdp_tez_spark.extensions import pngcodec
    from hdp_tez_spark.extensions.multimodal import synthesize_png_payloads

    ids = spark.createDataFrame([(1,), (2,), (7,)], "doc_id long")
    a = {
        r["doc_id"]: bytes(r["payload"])
        for r in synthesize_png_payloads(ids, size=(4, 4)).collect()
    }
    b = {
        r["doc_id"]: bytes(r["payload"])
        for r in synthesize_png_payloads(ids, size=(4, 4)).collect()
    }
    assert a == b
    assert len({v for v in a.values()}) == 3  # distinct ids -> distinct pixels
    for payload in a.values():
        assert pngcodec.decode(payload).shape == (4, 4, 3)


def test_resize_null_payload_guard_needs_no_codec(spark):
    """The NULL-payload guard fires BEFORE the codec gate (r08: the
    validation needs no imaging library), so the actionable
    'filter nulls upstream' message is testable — and reaches users —
    even in codec-free containers like this one."""
    df = spark.createDataFrame(
        [(7, None)], "doc_id long, payload binary"
    )
    with pytest.raises(Exception) as ei:
        resize_images(df).collect()
    msg = str(ei.value)
    assert "NULL payload" in msg
    assert "doc_id=7" in msg
    assert "isNotNull" in msg
