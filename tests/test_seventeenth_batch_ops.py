"""Behavioral tests for the seventeenth-batch operators: perceptual-hash
image dedup (phash_images / phash_near_dupes), the dispersion test,
the two-sample Poisson rate test, Chapman capture-recapture, tokenizer
fertility, and the 2x2 odds/risk ratio — known-answer cases the oracle
suite can't reach (a plain-Python decode+aHash reference, planted
near-identical images one bit flip apart, equal/disjoint samples,
hand-counted 2x2 tables).
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from hdp_tez_spark.extensions import pngcodec
from hdp_tez_spark.extensions.analytics import capture_recapture
from hdp_tez_spark.extensions.experiments import (
    dispersion_test,
    odds_ratio,
    poisson_rate_test,
)
from hdp_tez_spark.extensions.multimodal import (
    phash_images,
    phash_near_dupes,
    synthesize_png_payloads,
)
from hdp_tez_spark.extensions.textstats import tokenizer_fertility


def _ref_ahash(payload: bytes) -> int:
    """Independent plain-Python aHash: decode, nearest 8x8, integer
    gray, strict above-mean bits, MSB-first, two's complement."""
    arr = pngcodec.decode(payload)
    small = pngcodec.resize_nearest(arr, 8, 8)
    gray = small.astype(np.int64).sum(axis=2) // 3
    total = int(gray.sum())
    bits = 0
    for v in gray.reshape(-1):
        bits = (bits << 1) | (1 if int(v) * 64 > total else 0)
    return bits - (1 << 64) if bits >= 1 << 63 else bits


# ------------------------------------------------------------ phash_images


def test_phash_matches_python_reference(spark):
    ids = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    payloads = synthesize_png_payloads(ids, "doc_id", size=(16, 16))
    rows = payloads.collect()
    ref = {r.doc_id: _ref_ahash(bytes(r.payload)) for r in rows}
    out = {r.doc_id: r.phash for r in phash_images(payloads).collect()}
    assert out == ref


def test_phash_deterministic_across_runs(spark):
    ids = spark.createDataFrame([(i,) for i in range(4)], "doc_id long")
    payloads = synthesize_png_payloads(ids, "doc_id", size=(8, 8))
    h1 = {r.doc_id: r.phash for r in phash_images(payloads).collect()}
    h2 = {r.doc_id: r.phash for r in phash_images(payloads).collect()}
    assert h1 == h2


def test_phash_identical_payloads_identical_hash(spark):
    ids = spark.createDataFrame(
        [(0, 7), (1, 7), (2, 9)], "doc_id long, seed long"
    )
    payloads = synthesize_png_payloads(ids, "doc_id", seed_col="seed")
    out = {r.doc_id: r.phash for r in phash_images(payloads).collect()}
    assert out[0] == out[1] and out[0] != out[2]


# ------------------------------------------------------------ phash_near_dupes


def test_phash_near_dupes_finds_planted_pairs(spark):
    # seeds 0..3 repeated under 8 ids -> 4 identical pairs
    ids = spark.createDataFrame(
        [(i, i % 4) for i in range(8)], "doc_id long, seed long"
    )
    payloads = synthesize_png_payloads(ids, "doc_id", seed_col="seed")
    pairs = phash_near_dupes(payloads).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {
        (0, 4), (1, 5), (2, 6), (3, 7)
    }
    assert all(r.hamming == 0 for r in pairs)


def test_phash_near_dupes_catches_small_hamming(spark):
    # craft two images whose hashes differ by exactly one bit: take a
    # synthesized image and flip one 8x8 block enough to cross the mean
    ids = spark.createDataFrame([(0,)], "doc_id long")
    base = synthesize_png_payloads(ids, "doc_id", size=(8, 8)).collect()[0]
    arr = pngcodec.decode(bytes(base.payload))
    h0 = _ref_ahash(bytes(base.payload))
    # brute-force a single-pixel perturbation that flips exactly one bit
    flipped = None
    for dv in (120, -120):
        for y in range(8):
            for x in range(8):
                a2 = arr.copy().astype(int)
                a2[y, x] = np.clip(a2[y, x] + dv, 0, 255)
                pay2 = pngcodec.encode(a2.astype(np.uint8))
                h2 = _ref_ahash(pay2)
                if bin((h0 ^ h2) & ((1 << 64) - 1)).count("1") == 1:
                    flipped = pay2
                    break
            if flipped:
                break
        if flipped:
            break
    assert flipped is not None, "no single-bit perturbation found"
    df = spark.createDataFrame(
        [(0, bytes(base.payload)), (1, flipped)],
        "doc_id long, payload binary",
    )
    pairs = phash_near_dupes(df, max_hamming=3).collect()
    assert len(pairs) == 1 and pairs[0].hamming == 1


def test_phash_near_dupes_rejects_bad_threshold(spark):
    df = spark.createDataFrame([(0, b"x")], "doc_id long, payload binary")
    with pytest.raises(ValueError):
        phash_near_dupes(df, max_hamming=4)


# ------------------------------------------------------------ dispersion


def test_dispersion_poisson_like_unit(spark):
    # counts 1,2,3: mean 2, var 1 -> D = 0.5
    rows = [("u1", 1), ("u2", 1), ("u2", 1), ("u3", 1), ("u3", 1), ("u3", 1)]
    df = spark.createDataFrame(rows, "u string, x int")
    r = dispersion_test(df, "u").collect()[0]
    assert (r.n_units, r.total) == (3, 6)
    assert r.mean_count == pytest.approx(2.0)
    assert r.var_count == pytest.approx(1.0)
    assert r.dispersion == pytest.approx(0.5)


def test_dispersion_single_unit_null(spark):
    df = spark.createDataFrame([("u", 1), ("u", 1)], "u string, x int")
    r = dispersion_test(df, "u").collect()[0]
    assert r.var_count is None and r.dispersion is None


# ------------------------------------------------------------ poisson rate


def test_poisson_rate_hand_case(spark):
    # arm a: 6 events over 2 users (rate 3); arm b: 2 events over 2 (rate 1)
    rows = [("a", f"u{i % 2}") for i in range(6)] + [
        ("b", f"v{i % 2}") for i in range(2)
    ]
    df = spark.createDataFrame(rows, "arm string, u string")
    r = poisson_rate_test(df, "arm", "u", "a", "b").collect()[0]
    assert (r.x_a, r.t_a, r.x_b, r.t_b) == (6, 2, 2, 2)
    pooled = 8 / 4
    z = (3 - 1) / math.sqrt(pooled * (1 / 2 + 1 / 2))
    assert r.z_stat == pytest.approx(round(z, 6), abs=1e-6)


def test_poisson_rate_equal_rates_zero(spark):
    rows = [("a", "u1"), ("b", "v1")]
    df = spark.createDataFrame(rows, "arm string, u string")
    r = poisson_rate_test(df, "arm", "u", "a", "b").collect()[0]
    assert r.z_stat == pytest.approx(0.0)


# ------------------------------------------------------------ recapture


def test_capture_recapture_textbook(spark):
    # n_a = 4, n_b = 4, overlap 2 -> Chapman = 25/3 - 1
    a = spark.createDataFrame([(i,) for i in (1, 2, 3, 4)], "id long")
    b = spark.createDataFrame([(i,) for i in (3, 4, 5, 6)], "id long")
    r = capture_recapture(a, b, "id").collect()[0]
    assert (r.n_a, r.n_b, r.overlap) == (4, 4, 2)
    assert r.est_total == pytest.approx(round(25 / 3 - 1, 6), abs=1e-6)
    var = 5 * 5 * 2 * 2 / (9 * 4)
    assert r.se == pytest.approx(round(math.sqrt(var), 6), abs=1e-6)


def test_capture_recapture_full_overlap(spark):
    # identical samples: estimate equals the observed population
    a = spark.createDataFrame([(i,) for i in range(5)], "id long")
    r = capture_recapture(a, a, "id").collect()[0]
    assert r.est_total == pytest.approx(5.0)
    assert r.se == pytest.approx(0.0)


def test_capture_recapture_dedups_within_sample(spark):
    a = spark.createDataFrame([(1,), (1,), (2,)], "id long")
    b = spark.createDataFrame([(2,), (3,)], "id long")
    r = capture_recapture(a, b, "id").collect()[0]
    assert (r.n_a, r.n_b, r.overlap) == (2, 2, 1)


# ------------------------------------------------------------ fertility


def test_tokenizer_fertility_hand_counts(spark):
    # "ab cd" -> words 2, bpeish segments 2, chars 5
    # "x, y!" -> words 2 (x, y), segments: 'x' ',' 'y' '!' = 4, chars 5
    rows = [("en", "ab cd"), ("en", "x, y!")]
    df = spark.createDataFrame(rows, "lang string, text string")
    r = tokenizer_fertility(df, "lang", "text").collect()[0]
    assert (r.n_docs, r.n_words, r.n_segments, r.n_chars) == (2, 4, 6, 10)
    assert r.fertility == pytest.approx(1.5)
    assert r.chars_per_segment == pytest.approx(round(10 / 6, 6))


def test_tokenizer_fertility_zero_word_null(spark):
    df = spark.createDataFrame([("xx", "!!!")], "lang string, text string")
    r = tokenizer_fertility(df, "lang", "text").collect()[0]
    assert r.n_words == 0 and r.fertility is None


# ------------------------------------------------------------ odds_ratio


def test_odds_ratio_textbook(spark):
    # a=10, b=20, c=5, d=40: OR = 10*40/(20*5) = 4; RR = (10/30)/(5/45) = 3
    rows = (
        [(True, True)] * 10
        + [(True, False)] * 20
        + [(False, True)] * 5
        + [(False, False)] * 40
    )
    df = spark.createDataFrame(rows, "e boolean, o boolean")
    r = odds_ratio(df, "e", "o").collect()[0]
    assert (r.a, r.b, r.c, r.d) == (10, 20, 5, 40)
    assert r.odds_ratio == pytest.approx(4.0)
    assert r.risk_ratio == pytest.approx(3.0)
    se = math.sqrt(1 / 10 + 1 / 20 + 1 / 5 + 1 / 40)
    assert r.or_lo == pytest.approx(round(4 * math.exp(-1.96 * se), 6), abs=1e-6)
    assert r.or_hi == pytest.approx(round(4 * math.exp(1.96 * se), 6), abs=1e-6)


def test_odds_ratio_zero_cell_null(spark):
    rows = [(True, True)] * 3 + [(False, False)] * 3
    df = spark.createDataFrame(rows, "e boolean, o boolean")
    r = odds_ratio(df, "e", "o").collect()[0]
    assert r.odds_ratio is None and r.or_lo is None


def test_odds_ratio_no_association_is_one(spark):
    rows = [(e, o) for e in (True, False) for o in (True, False) for _ in range(5)]
    df = spark.createDataFrame(rows, "e boolean, o boolean")
    r = odds_ratio(df, "e", "o").collect()[0]
    assert r.odds_ratio == pytest.approx(1.0)
    assert r.risk_ratio == pytest.approx(1.0)
