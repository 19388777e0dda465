"""Behavioral tests for the tenth-batch operators: Brier/ECE/MCE
calibration gate, distinct-n corpus diversity, stratified k-fold
balance, and deterministic negative sampling — known-answer cases the
oracle suite can't reach (hand-computed two-bin calibration, template
floods vs fully-diverse corpora, exact per-stratum fold balance on
skewed strata, and the rejection/determinism contracts of the
negative sampler).
"""

from __future__ import annotations

import pytest

from hdp_tez_spark.extensions.experiments import calibration_error
from hdp_tez_spark.extensions.graph import negative_sampling
from hdp_tez_spark.extensions.splits import stratified_kfold
from hdp_tez_spark.extensions.textstats import distinct_ngrams


# ------------------------------------------------------------ calibration_error


def test_calibration_error_hand_computed_two_bins(spark):
    # bin 0: scores 0.05 x4, 1 positive -> conf 0.05, acc 0.25, gap 0.2
    # bin 9: scores 0.95 x4, 3 positives -> conf 0.95, acc 0.75, gap 0.2
    rows = [(0.05, 1), (0.05, 0), (0.05, 0), (0.05, 0)] + [
        (0.95, 1), (0.95, 1), (0.95, 1), (0.95, 0)
    ]
    df = spark.createDataFrame(rows, "score double, label int")
    r = calibration_error(df, "score", "label", bins=10).collect()[0]
    assert (r.n, r.n_pos) == (8, 4)
    brier = (
        (0.05 - 1) ** 2 + 3 * 0.05**2 + 3 * (0.95 - 1) ** 2 + 0.95**2
    ) / 8
    assert r.brier == pytest.approx(brier, abs=1e-6)
    assert r.ece == pytest.approx(0.2, abs=1e-6)
    assert r.mce == pytest.approx(0.2, abs=1e-6)


def test_calibration_error_perfectly_calibrated_is_zero_ece(spark):
    # every bin's mean score equals its positive rate exactly
    rows = [(0.25, 1), (0.25, 0), (0.25, 0), (0.25, 0)] + [
        (0.75, 1), (0.75, 1), (0.75, 1), (0.75, 0)
    ]
    df = spark.createDataFrame(rows, "score double, label int")
    r = calibration_error(df, "score", "label", bins=4).collect()[0]
    assert r.ece == pytest.approx(0.0, abs=1e-9)
    assert r.mce == pytest.approx(0.0, abs=1e-9)
    assert r.brier == pytest.approx((0.75**2 + 3 * 0.25**2) / 4, abs=1e-6)


# ------------------------------------------------------------ distinct_ngrams


def test_distinct_ngrams_template_flood_vs_diverse(spark):
    flood = spark.createDataFrame(
        [(i, "the same line again") for i in range(10)],
        "doc_id long, text string",
    )
    out = {r.n: r for r in distinct_ngrams(flood, "doc_id", "text", ns=(1, 2)).collect()}
    assert out[1].total_ngrams == 40 and out[1].distinct_ngrams == 4
    assert out[2].total_ngrams == 30 and out[2].distinct_ngrams == 3
    assert out[2].distinct_ratio == pytest.approx(0.1, abs=1e-6)

    diverse = spark.createDataFrame(
        [(1, "aa bb cc dd ee ff")], "doc_id long, text string"
    )
    out2 = {r.n: r for r in distinct_ngrams(diverse, "doc_id", "text", ns=(2,)).collect()}
    assert out2[2].distinct_ratio == pytest.approx(1.0, abs=1e-9)


def test_distinct_ngrams_short_docs_contribute_no_higher_orders(spark):
    df = spark.createDataFrame(
        [(1, "one two"), (2, "three")], "doc_id long, text string"
    )
    out = {r.n: r for r in distinct_ngrams(df, "doc_id", "text", ns=(1, 3)).collect()}
    assert out[1].total_ngrams == 3
    assert out[3].total_ngrams == 0  # no doc has 3 tokens
    assert out[3].distinct_ratio is None  # 0/0: undefined, not fake 0


# ------------------------------------------------------------ stratified_kfold


def test_stratified_kfold_exact_per_stratum_balance(spark):
    # skewed strata: 50-row majority, 7-row minority
    rows = [(i, "big") for i in range(50)] + [(1000 + i, "small") for i in range(7)]
    df = spark.createDataFrame(rows, "id long, lang string")
    out = stratified_kfold(df, "id", ["lang"], k=5).collect()
    from collections import Counter

    by = Counter((r.lang, r.fold) for r in out)
    big = [by[("big", f)] for f in range(5)]
    small = [by[("small", f)] for f in range(5)]
    assert big == [10, 10, 10, 10, 10]
    assert max(small) - min(small) <= 1 and sum(small) == 7


def test_stratified_kfold_is_input_order_independent(spark):
    rows = [(i, "x" if i % 3 else "y") for i in range(30)]
    df1 = spark.createDataFrame(rows, "id long, lang string")
    df2 = spark.createDataFrame(rows[::-1], "id long, lang string").repartition(7)
    a = {r.id: r.fold for r in stratified_kfold(df1, "id", ["lang"], k=4).collect()}
    b = {r.id: r.fold for r in stratified_kfold(df2, "id", ["lang"], k=4).collect()}
    assert a == b


# ------------------------------------------------------------ negative_sampling


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "a long, b long")


def test_negative_sampling_rejects_true_edges_and_self(spark):
    pairs = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 7), (7, 8)]
    e = _edges(spark, pairs)
    out = negative_sampling(e, k=3).collect()
    truth = {(min(a, b), max(a, b)) for a, b in pairs}
    for r in out:
        assert r.node != r.neg
        assert (min(r.node, r.neg), max(r.node, r.neg)) not in truth
    # every node got at most k, draws are 0-based consecutive
    from collections import defaultdict

    per = defaultdict(list)
    for r in out:
        per[r.node].append(r.draw)
    for node, draws in per.items():
        assert sorted(draws) == list(range(len(draws)))
        assert len(draws) <= 3


def test_negative_sampling_is_deterministic_and_salt_sensitive(spark):
    pairs = [(i, i + 1) for i in range(1, 12)]
    e = _edges(spark, pairs)
    a = sorted((r.node, r.neg) for r in negative_sampling(e, k=2).collect())
    b = sorted((r.node, r.neg) for r in negative_sampling(e, k=2).collect())
    assert a == b  # pure function of (edges, k, salt)
    c = sorted(
        (r.node, r.neg)
        for r in negative_sampling(e, k=2, salt="other").collect()
    )
    assert a != c  # the salt reseeds the draw sequence


def test_negative_sampling_near_complete_graph_truncates(spark):
    # K4 minus one edge: node 1's only possible negative is node 4
    pairs = [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)]
    e = _edges(spark, pairs)
    out = negative_sampling(e, k=3, oversample=8).collect()
    negs_of_1 = [r.neg for r in out if r.node == 1]
    assert set(negs_of_1) <= {4}
