"""Behavioral tests for the thirteenth-batch operators: readability
scoring, Heaps-law vocabulary growth, Fellegi-Sunter linkage weights,
confident-learning label noise, A/B power analysis, and behavioral
entropy — known-answer cases the oracle suite can't reach
(hand-computed syllable/sentence counts and formula values, saturated
vs growing vocabularies, perfect-match vs random-field weights, planted
label noise, textbook sample sizes, and zero-entropy bot streams).
"""

from __future__ import annotations

import datetime as dt
import math

import pytest

from hdp_tez_spark.extensions.analytics import behavior_entropy
from hdp_tez_spark.extensions.dedup import linkage_weights
from hdp_tez_spark.extensions.experiments import label_noise, power_analysis
from hdp_tez_spark.extensions.textstats import readability_scores, vocab_growth


# ------------------------------------------------------------ readability_scores


def test_readability_hand_computed(spark):
    # "the cat sat. it ran!" -> 5 words, 2 sentences, 5 syllables
    # (every word one vowel run)
    df = spark.createDataFrame([(1, "the cat sat. it ran!")], "id long, text string")
    r = readability_scores(df, "id", "text").collect()[0]
    assert (r.n_words, r.n_sentences, r.n_syllables) == (5, 2, 5)
    wps, spw = 5 / 2, 5 / 5
    assert r.flesch == pytest.approx(206.835 - 1.015 * wps - 84.6 * spw, abs=1e-6)
    assert r.fk_grade == pytest.approx(0.39 * wps + 11.8 * spw - 15.59, abs=1e-6)


def test_readability_syllable_runs_and_floors(spark):
    # "beautiful" -> vowel runs eau|i|u = 3; "xyz" (no vowels... y IS a
    # vowel here) -> "xyz" has 1 run; "grr" -> 0 runs floored to 1.
    # no terminator -> sentences floored to 1.
    df = spark.createDataFrame([(1, "beautiful grr")], "id long, text string")
    r = readability_scores(df, "id", "text").collect()[0]
    assert (r.n_words, r.n_sentences, r.n_syllables) == (2, 1, 4)


def test_readability_drops_empty_docs(spark):
    df = spark.createDataFrame([(1, "..."), (2, "word.")], "id long, text string")
    out = readability_scores(df, "id", "text").collect()
    assert [r.id for r in out] == [2]


# ------------------------------------------------------------ vocab_growth


def test_vocab_growth_saturated_vs_growing(spark):
    # saturated: same token forever -> cum_vocab constant -> beta ~ 0
    flood = spark.createDataFrame(
        [(i, "same same same") for i in range(20)], "doc_id long, text string"
    )
    r = vocab_growth(flood, "doc_id", "text").collect()[0]
    assert r.vocab_size == 1 and r.total_tokens == 60
    assert abs(r.heaps_beta) < 1e-9

    # fully novel: every token new -> V(n) = n -> beta = 1, k = 1
    fresh = spark.createDataFrame(
        [(i, f"tok{i}a tok{i}b") for i in range(20)], "doc_id long, text string"
    )
    r2 = vocab_growth(fresh, "doc_id", "text").collect()[0]
    assert r2.vocab_size == 40
    assert r2.heaps_beta == pytest.approx(1.0, abs=1e-6)
    assert r2.heaps_k == pytest.approx(1.0, abs=1e-6)


# ------------------------------------------------------------ linkage_weights


def test_linkage_weights_perfect_field_vs_random(spark):
    # blocking key groups ids into adjacent sorted positions; field
    # "good" agrees on every candidate pair, "bad" never agrees.
    rows = [(i, "k", "same", f"uniq{i}") for i in range(6)]
    df = spark.createDataFrame(rows, "id long, key string, good string, bad string")
    out = {r.field: r for r in linkage_weights(df, "id", "key", ["good", "bad"], window=2).collect()}
    g, b = out["good"], out["bad"]
    assert g.m_prob == 1.0 and g.u_prob == 1.0
    # degenerate u=1 -> weights NULL, never +/-inf
    assert g.agree_weight is None and g.disagree_weight is None
    assert b.m_prob == 0.0 and b.u_prob == 0.0
    assert b.agree_weight is None and b.disagree_weight is None


def test_linkage_weights_known_m_and_u(spark):
    # 4 records, window=3 -> all C(4,2)=6 pairs are candidates.
    # field f: values a,a,b,b -> agreeing pairs {1-2, 3-4} = 2/6;
    # u = (2*1 + 2*1) / (4*3) = 4/12 = 1/3
    rows = [(1, "k", "a"), (2, "k", "a"), (3, "k", "b"), (4, "k", "b")]
    df = spark.createDataFrame(rows, "id long, key string, f string")
    r = linkage_weights(df, "id", "key", ["f"], window=3).collect()[0]
    assert r.n_pairs == 6
    assert r.m_prob == pytest.approx(2 / 6, abs=1e-6)
    assert r.u_prob == pytest.approx(1 / 3, abs=1e-6)
    # m == u -> zero evidence either way
    assert r.agree_weight == pytest.approx(0.0, abs=1e-5)
    assert r.disagree_weight == pytest.approx(0.0, abs=1e-5)


def test_linkage_weights_requires_fields(spark):
    df = spark.createDataFrame([(1, "k", "a")], "id long, key string, f string")
    with pytest.raises(ValueError):
        linkage_weights(df, "id", "key", [])


# ------------------------------------------------------------ label_noise


def test_label_noise_planted_flips(spark):
    # scores cleanly separated (0.1 vs 0.9); 4 correct per class plus
    # one flipped label each way -> off-diagonals catch exactly those
    rows = (
        [(i, 0.9, 1) for i in range(4)]
        + [(10 + i, 0.1, 0) for i in range(4)]
        + [(20, 0.9, 0), (21, 0.1, 1)]
    )
    df = spark.createDataFrame(rows, "id long, score double, label int")
    out = {(r.given_label, r.suggested_label): r.n for r in label_noise(df, "id", "score", "label").collect()}
    assert out[(0, 1)] == 1 and out[(1, 0)] == 1
    assert out[(0, 0)] == 4 and out[(1, 1)] == 4


def test_label_noise_fracs_sum_to_one_per_given(spark):
    rows = [(i, (i % 10) / 10.0, int(i % 3 == 0)) for i in range(60)]
    df = spark.createDataFrame(rows, "id long, score double, label int")
    out = label_noise(df, "id", "score", "label").collect()
    by_given: dict[int, float] = {}
    for r in out:
        by_given[r.given_label] = by_given.get(r.given_label, 0.0) + r.frac_of_given
    for tot in by_given.values():
        assert tot == pytest.approx(1.0, abs=1e-5)


# ------------------------------------------------------------ power_analysis


def test_power_analysis_textbook_value(spark):
    # p1=0.10, mde_rel=0.2 -> p2=0.12: classic two-proportion n at
    # alpha .05 / power .80 is ~3835 per arm
    rows = [("g", 1.0)] * 10 + [("g", 0.0)] * 90
    df = spark.createDataFrame(rows, "grp string, label double")
    r = power_analysis(df, ["grp"], "label", mde_rel=0.2).collect()[0]
    assert (r.n_obs, r.p_base, r.p_target) == (100, 0.1, 0.12)
    p1, p2 = 0.10, 0.12
    pbar = (p1 + p2) / 2
    za, zb = 1.9599639845400545, 0.8416212335729143
    exp = math.ceil(
        (za * math.sqrt(2 * pbar * (1 - pbar)) + zb * math.sqrt(p1 * (1 - p1) + p2 * (1 - p2))) ** 2
        / (p2 - p1) ** 2
    )
    assert r.n_per_arm == exp


def test_power_analysis_degenerate_rates_are_null(spark):
    df = spark.createDataFrame(
        [("all", 1.0), ("all", 1.0), ("none", 0.0), ("none", 0.0)],
        "grp string, label double",
    )
    out = {r.grp: r.n_per_arm for r in power_analysis(df, ["grp"], "label").collect()}
    assert out == {"all": None, "none": None}
    with pytest.raises(ValueError):
        power_analysis(df, ["grp"], "label", mde_rel=0.0)


# ------------------------------------------------------------ behavior_entropy


def test_behavior_entropy_bot_vs_mixed(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [("bot", base + dt.timedelta(seconds=i), "ping", i) for i in range(8)]
    # alternating a/b: marginal H=1 bit, but transitions fully
    # deterministic -> conditional H=0
    rows += [
        ("alt", base + dt.timedelta(seconds=i), "ab"[i % 2], 100 + i)
        for i in range(8)
    ]
    df = spark.createDataFrame(rows, "u string, ts timestamp, t string, id long")
    out = {r.u: r for r in behavior_entropy(df, ["u"], "t", "ts", "id").collect()}
    assert out["bot"].h_marginal == 0.0 and out["bot"].h_conditional == 0.0
    assert out["alt"].h_marginal == pytest.approx(1.0, abs=1e-6)
    assert out["alt"].h_conditional == pytest.approx(0.0, abs=1e-9)


def test_behavior_entropy_uniform_iid_stream(spark):
    base = dt.datetime(2024, 1, 1)
    # 4 types in a de Bruijn-ish cycle visiting every transition equally
    seq = "abcdbadcacbd" * 4
    rows = [("u", base + dt.timedelta(seconds=i), c, i) for i, c in enumerate(seq)]
    df = spark.createDataFrame(rows, "u string, ts timestamp, t string, id long")
    r = behavior_entropy(df, ["u"], "t", "ts", "id").collect()[0]
    assert r.n_types == 4
    assert r.h_marginal == pytest.approx(2.0, abs=1e-6)
    # conditional entropy of a rich mixing sequence is high but <= marginal
    assert 0.0 < r.h_conditional <= r.h_marginal + 1e-9


def test_behavior_entropy_min_events_filter(spark):
    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [("solo", base, "x", 1), ("pair", base, "x", 2),
         ("pair", base + dt.timedelta(seconds=1), "y", 3)],
        "u string, ts timestamp, t string, id long",
    )
    out = {r.u for r in behavior_entropy(df, ["u"], "t", "ts", "id").collect()}
    assert out == {"pair"}
