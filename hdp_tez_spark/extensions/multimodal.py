"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed with Arrow-batched pandas iterators.

Beyond-reference extension (BASELINE.json). The pattern for a 100 TB
multimodal corpus:

- payloads travel as a `binary` column next to typed metadata columns —
  never exploded into rows, never through Python row-at-a-time UDFs;
- decode / feature-extract / resize / frame-sample run via
  `mapInPandas`: Arrow ships whole record batches to Python once per
  batch, the worker loops in C-speed pandas, and the schema is declared
  up front so Catalyst can prune/push around the op;
- real codec work (PIL/ffmpeg/soundfile) is detected at import
  (HAVE_REAL_CODECS): when an imaging library is present the resize
  path decodes real pixels; when absent (this container), the
  `_require_codec()` guard raises an honest NotImplementedError and a
  deterministic md5-based fake keeps the plumbing (schema, batching,
  partitioning) fully testable and oracle-checkable.

The fake "decode" derives width/height/frames from the payload's md5,
reproducible in SQL: width = 16*(1 + h0 % 120) with
h0 = ('0x' || substr(md5(payload),1,2))::INT, etc.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

try:  # runtime detection: the decode path lights up automatically if the
    # environment ever gains an imaging library; absent one, the honest
    # NotImplementedError stub below is the documented behavior
    import PIL.Image as _PIL_Image  # noqa: F401

    HAVE_REAL_CODECS = True
except ImportError:  # pragma: no cover - environment-dependent
    HAVE_REAL_CODECS = False


def _require_codec(name: str) -> None:
    if not HAVE_REAL_CODECS:
        raise NotImplementedError(
            f"real {name} decoding needs a media library not present in this "
            "environment; 8-bit non-interlaced PNG payloads decode via the "
            "stdlib fallback (extensions/pngcodec.py), and the deterministic "
            "fake decode path remains the format-agnostic testable surface "
            "(see fake_decode_meta)"
        )


def attach_payload(df: DataFrame, text_col: str, payload_col: str = "payload") -> DataFrame:
    """Stand-in payload ingestion: utf-8 bytes of a text column as the
    opaque binary. In production this is the parquet/tar reader emitting
    real image/audio bytes; everything downstream is identical."""
    return df.withColumn(payload_col, F.encode(F.col(text_col), "utf-8"))


META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("modality", StringType()),
    ]
)


def _fake_meta(payload: bytes) -> tuple[int, int, int, str]:
    """Deterministic pseudo-decode from the payload digest (SQL-reproducible)."""
    digest = hashlib.md5(payload).hexdigest()
    h0 = int(digest[0:2], 16)
    h1 = int(digest[2:4], 16)
    h2 = int(digest[4:6], 16)
    width = 16 * (1 + h0 % 120)
    height = 16 * (1 + h1 % 68)
    n_frames = 1 + h2 % 240
    modality = ("image", "audio", "video")[h0 % 3]
    return width, height, n_frames, modality


def decode_meta(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Extract typed metadata from binary payloads via mapInPandas.

    Arrow-batched: each python worker receives whole record batches; the
    loop below is per-batch pandas, not per-row Spark. Output schema is
    declared (META_SCHEMA) so downstream ops prune columns normally.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = pdf[payload_col].map(_fake_meta)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": pdf[payload_col].map(len).astype("int32"),
                    "width": metas.map(lambda m: m[0]).astype("int32"),
                    "height": metas.map(lambda m: m[1]).astype("int32"),
                    "n_frames": metas.map(lambda m: m[2]).astype("int32"),
                    "modality": metas.map(lambda m: m[3]),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(decode_batches, META_SCHEMA)


HEADER_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("container", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)


def _sniff_header(payload: bytes):
    """(container, width, height, duration_ms) from real container
    headers — magic bytes + fixed-offset fields, pure stdlib. This is NOT
    the fake path: PNG/GIF/BMP/JPEG dimensions and WAV duration live in
    the first bytes of the file, so a 100 TB corpus can be profiled
    without decoding a single pixel/sample (and without media libs)."""
    try:
        if payload[:8] == b"\x89PNG\r\n\x1a\n" and len(payload) >= 24:
            w, h = struct.unpack(">II", payload[16:24])
            return "png", w, h, None
        if payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
            w, h = struct.unpack("<HH", payload[6:10])
            return "gif", w, h, None
        if payload[:2] == b"BM" and len(payload) >= 26:
            w, h = struct.unpack("<ii", payload[18:26])
            return "bmp", w, abs(h), None
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            # walk RIFF chunks for fmt (byte rate) and data (payload size)
            pos, byte_rate, data_size = 12, None, None
            while pos + 8 <= len(payload):
                cid = payload[pos : pos + 4]
                csize = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
                if cid == b"fmt " and pos + 16 <= len(payload):
                    byte_rate = struct.unpack("<I", payload[pos + 16 : pos + 20])[0]
                elif cid == b"data":
                    data_size = csize
                pos += 8 + csize + (csize & 1)
            if byte_rate and data_size is not None:
                return "wav", None, None, int(data_size * 1000 // byte_rate)
            return "wav", None, None, None
        if payload[:3] == b"\xff\xd8\xff":
            # JPEG: walk segments to the first SOF marker for dimensions
            pos = 2
            while pos + 9 <= len(payload):
                if payload[pos] != 0xFF:
                    break
                marker = payload[pos + 1]
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    pos += 2
                    continue
                seg_len = struct.unpack(">H", payload[pos + 2 : pos + 4])[0]
                if marker in (0xC0, 0xC1, 0xC2, 0xC3):
                    h, w = struct.unpack(">HH", payload[pos + 5 : pos + 9])
                    return "jpeg", w, h, None
                pos += 2 + seg_len
            return "jpeg", None, None, None
    except (struct.error, IndexError):
        pass
    return None, None, None, None


def parse_media_headers(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """REAL container-metadata decode over a binary column: identifies
    PNG/GIF/BMP/JPEG/WAV payloads and reads their dimensions/duration
    straight from the header bytes via Arrow-batched mapInPandas.
    Unknown containers yield NULL fields (keep the row — filtering is the
    caller's policy). Complements `decode_meta`'s deterministic fake: the
    plumbing is shared, but this path needs no codec at all."""

    def header_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = pdf[payload_col].map(
                lambda p: _sniff_header(bytes(p)) if p is not None else (None,) * 4
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "container": metas.map(lambda m: m[0]),
                    "width": metas.map(lambda m: m[1]).astype("Int32"),
                    "height": metas.map(lambda m: m[2]).astype("Int32"),
                    "duration_ms": metas.map(lambda m: m[3]).astype("Int32"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(header_batches, HEADER_SCHEMA)


def synthesize_png_payloads(
    df: DataFrame,
    id_col: str = "doc_id",
    size: tuple[int, int] = (4, 4),
    payload_col: str = "payload",
    seed_col: str | None = None,
) -> DataFrame:
    """Deterministic REAL PNG payloads from an id column: each row gets
    an 8-bit RGB PNG of `size` whose pixels are seeded by the id — or by
    `seed_col` when given, so tests can PLANT byte-identical duplicate
    images under distinct ids (extensions/pngcodec.py encode — stdlib
    only, identical bytes for identical seeds on every executor/retry). This is the test-data twin
    of a binary ingest: everything downstream (schema, Arrow batches,
    decode/resize) handles genuine image bytes, not placeholder text.

    Scale shape: map-side only (mapInPandas, no shuffle); payload size
    is O(w*h*3) per row.
    """
    w, h = size
    sc = seed_col or id_col

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from hdp_tez_spark.extensions import pngcodec

        for pdf in batches:
            payloads = []
            for seed in pdf[sc]:
                rng = np.random.default_rng(int(seed))
                arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
                payloads.append(pngcodec.encode(arr))
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].astype("int64"), payload_col: payloads}
            )

    cols = [id_col] if sc == id_col else [id_col, sc]
    return df.select(*cols).mapInPandas(
        gen,
        StructType(
            [
                StructField("doc_id", LongType()),
                StructField(payload_col, BinaryType()),
            ]
        ),
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("resized", BinaryType()),
    ]
)


def resize_images(
    df: DataFrame,
    target: tuple[int, int] = (224, 224),
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Resize images to `target`: PIL when an imaging library is present
    (detected at import — HAVE_REAL_CODECS, bilinear, any PIL-readable
    format); otherwise REAL pixels still flow for 8-bit non-interlaced
    PNG payloads through the stdlib codec (extensions/pngcodec.py —
    zlib-inflate scanlines, unfilter, nearest-neighbor resize, filter-0
    re-encode). Only a non-PNG payload in a codec-less environment
    raises the honest NotImplementedError.

    The mapInPandas wiring (schema, batch iteration, target size capture)
    is identical on both branches. Both re-encode as PNG so the output
    bytes are deterministic for identical inputs (fixed filter + zlib
    level on the stdlib path; PIL's defaults on the PIL path).
    """
    tw, th = target

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        for pdf in batches:
            # NULL validation BEFORE the codec gate: the actionable
            # "filter nulls upstream" error needs no imaging library, so
            # callers get it (and tests cover it) even in codec-less
            # environments where _require_codec would mask it.
            nulls = pdf[payload_col].isna()
            if nulls.any():
                doc_id = pdf[id_col][nulls].iloc[0]
                # Explicit per-row error beats the opaque TypeError
                # bytes(None) would raise inside the Arrow worker;
                # callers that expect nulls should .where(isNotNull)
                # the payload column before resizing.
                raise ValueError(
                    f"resize_images: NULL {payload_col} for "
                    f"{id_col}={doc_id}; filter null payloads "
                    "upstream (df.where(F.col(payload).isNotNull()))"
                )
            out_bytes = []
            if HAVE_REAL_CODECS:
                from PIL import Image

                for payload in pdf[payload_col]:
                    with Image.open(io.BytesIO(bytes(payload))) as im:
                        resized = im.resize((tw, th), Image.BILINEAR)
                        buf = io.BytesIO()
                        resized.save(buf, format="PNG")
                        out_bytes.append(buf.getvalue())
            else:
                from hdp_tez_spark.extensions import pngcodec

                for payload in pdf[payload_col]:
                    raw = bytes(payload)
                    if not pngcodec.is_png(raw):
                        _require_codec("image")  # non-PNG: honest stub
                    arr = pngcodec.decode(raw)
                    out_bytes.append(
                        pngcodec.encode(pngcodec.resize_nearest(arr, tw, th))
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "width": pd.Series([tw] * len(pdf), dtype="int32"),
                    "height": pd.Series([th] * len(pdf), dtype="int32"),
                    "resized": out_bytes,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(resize_batches, RESIZED_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_md5", StringType()),
    ]
)


def sample_frames(
    df: DataFrame,
    every_nth: int = 30,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Frame sampling (1 row out per sampled frame — a flat-map).

    Uses the deterministic fake: frame i's digest is md5(payload || i).
    With a real container parser only `_frames_of` changes; the 1->N
    mapInPandas shape stays.
    """

    def _frames_of(doc_id: int, payload: bytes) -> list[tuple[int, int, str]]:
        _, _, n_frames, _ = _fake_meta(payload)
        out = []
        for i in range(0, n_frames, every_nth):
            digest = hashlib.md5(payload + str(i).encode()).hexdigest()
            out.append((doc_id, i, digest))
        return out

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple[int, int, str]] = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                rows.extend(_frames_of(int(doc_id), payload))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_md5"]).astype(
                {"doc_id": "int64", "frame_idx": "int32"}
            )

    return df.select(id_col, payload_col).mapInPandas(frame_batches, FRAME_SCHEMA)


PHASH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("phash", LongType()),
    ]
)


def phash_images(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """64-bit perceptual AVERAGE hash (aHash) of PNG payloads — the
    image twin of the text `fingerprint` operator, and the signature
    behind `phash_near_dupes`: decode (extensions/pngcodec.py, stdlib
    only), nearest-resize to 8x8, integer grayscale (r+g+b)//3, then
    one bit per pixel set iff gray*64 > sum(gray) (the strict integer
    form of "above the mean" — no float threshold, so identical bytes
    hash identically on every engine/executor/retry). Bits pack
    row-major MSB-first into one signed 64-bit value (two's
    complement). PIL is NOT consulted even when present: the stdlib
    path is deterministic by construction, which is what a dedup
    signature requires. Non-PNG payloads raise the honest codec error.

    Scale shape: map-side only (Arrow-batched mapInPandas, no shuffle);
    output is one (id, long) row per image.
    """

    def hash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from hdp_tez_spark.extensions import pngcodec

        for pdf in batches:
            hashes = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload)
                if not pngcodec.is_png(data):
                    _require_codec(f"{id_col}={doc_id}: non-PNG payload")
                arr = pngcodec.decode(data)
                small = pngcodec.resize_nearest(arr, 8, 8)
                gray = small.astype(np.int64).sum(axis=2) // 3
                total = int(gray.sum())
                bits = 0
                for v in gray.reshape(-1):
                    bits = (bits << 1) | (1 if int(v) * 64 > total else 0)
                if bits >= 1 << 63:
                    bits -= 1 << 64
                hashes.append(bits)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "phash": pd.Series(hashes, dtype="int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        hash_batches, PHASH_SCHEMA
    )


def phash_near_dupes(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-duplicate image pairs by perceptual-hash banding — the
    multimodal member of the dedup family (exact_dedup / minhash_lsh /
    simhash for text): aHash every payload (`phash_images`), band the
    64-bit signature into four 16-bit quarters, bucket-join on (band,
    value), verify candidates with an exact popcount. The pigeonhole
    guarantee makes banding EXACT here, not probabilistic: a pair
    within hamming distance 3 differs in at most 3 of the 4 bands, so
    at least one band matches and the pair is always a candidate
    (minhash banding only achieves this in probability). Output:
    (id_a, id_b, hamming) with id_a < id_b, hamming <= max_hamming
    (which must be < 4 to keep the guarantee), ordered.

    Scale shape: the hash table is one narrow (id, long) row per image
    (map-side, no shuffle to build); the band explode is x4; the
    candidate join is an EQUI-join on (band, 16-bit value) — never
    all-pairs; verification is one integer xor+bit_count per candidate.
    The 100 TB posture matches minhash_lsh: shuffle O(images x 4)
    8-byte keys, and bucket skew only arises from genuinely identical
    quarters (true near-dups).
    """
    if not 0 <= max_hamming < 4:
        raise ValueError(
            f"max_hamming must be in [0, 4) for the 4-band pigeonhole "
            f"guarantee, got {max_hamming}"
        )
    hashes = phash_images(df, id_col, payload_col)
    from hdp_tez_spark.plans.checkpoints import truncate_lineage

    hashes = truncate_lineage(hashes)
    bands = hashes.select(
        F.col("doc_id"),
        F.col("phash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("__band"),
                        F.shiftrightunsigned(F.col("phash"), 16 * i)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("__bv"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("__s"),
    ).select("doc_id", "phash", "__s.__band", "__s.__bv")
    left = bands.select(
        F.col("__band"),
        F.col("__bv"),
        F.col("doc_id").alias("id_a"),
        F.col("phash").alias("__ha"),
    )
    right = bands.select(
        F.col("__band"),
        F.col("__bv"),
        F.col("doc_id").alias("id_b"),
        F.col("phash").alias("__hb"),
    )
    cands = (
        left.join(right, ["__band", "__bv"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "__ha", "__hb")
        .distinct()
    )
    ham = F.bit_count(F.col("__ha").bitwiseXOR(F.col("__hb")))
    return (
        cands.select("id_a", "id_b", ham.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
        .orderBy("id_a", "id_b")
    )
