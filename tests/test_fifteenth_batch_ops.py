"""Behavioral tests for the fifteenth-batch operators: one-way ANOVA F,
Cramér's V, 1-D Wasserstein distance, Simple Good-Turing bands, Dunning
log-likelihood keyness, and HITS hub/authority — known-answer cases the
oracle suite can't reach (a textbook two-group F decomposition,
perfect-association and independence contingencies, a pure-shift
transport cost, hand-counted frequency bands, proportion-matched
zero-keyness, and a hand-iterated bipartite HITS).
"""

from __future__ import annotations

import math

import pytest

from hdp_tez_spark.extensions.experiments import (
    anova_oneway,
    cramers_v,
    wasserstein_1d,
)
from hdp_tez_spark.extensions.graph import hits_scores
from hdp_tez_spark.extensions.textstats import good_turing, keyness_llr


# ------------------------------------------------------------ anova_oneway


def test_anova_textbook_two_groups(spark):
    # g1 = 1,2,3 (mean 2), g2 = 4,5,6 (mean 5); grand mean 3.5
    # SSB = 3*(2-3.5)^2 + 3*(5-3.5)^2 = 13.5; SSW = 2 + 2 = 4
    # F = (13.5/1) / (4/4) = 13.5; eta^2 = 13.5/17.5
    rows = [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 4.0), ("b", 5.0), ("b", 6.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = anova_oneway(df, "g", "v").collect()[0]
    assert (r.n_groups, r.n) == (2, 6)
    assert r.ss_between == pytest.approx(13.5, abs=1e-6)
    assert r.ss_within == pytest.approx(4.0, abs=1e-6)
    assert r.f_stat == pytest.approx(13.5, abs=1e-6)
    assert r.eta_sq == pytest.approx(13.5 / 17.5, abs=1e-6)


def test_anova_constant_groups_null_f(spark):
    # zero within-group variance -> SSW = 0 -> f_stat NULL, eta_sq 1
    rows = [("a", 1.0), ("a", 1.0), ("b", 2.0), ("b", 2.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = anova_oneway(df, "g", "v").collect()[0]
    assert r.f_stat is None
    assert r.eta_sq == 1.0


def test_anova_one_row_per_group_null_f(spark):
    # N = k -> no within df -> f_stat NULL
    rows = [("a", 1.0), ("b", 2.0), ("c", 3.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = anova_oneway(df, "g", "v").collect()[0]
    assert r.f_stat is None


def test_anova_excludes_nulls(spark):
    rows = [("a", 1.0), ("a", None), (None, 5.0), ("b", 2.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = anova_oneway(df, "g", "v").collect()[0]
    assert (r.n_groups, r.n) == (2, 2)


# ------------------------------------------------------------ cramers_v


def test_cramers_v_perfect_association(spark):
    rows = [("a", "x")] * 5 + [("b", "y")] * 5
    df = spark.createDataFrame(rows, "u string, w string")
    r = cramers_v(df, "u", "w").collect()[0]
    assert (r.n, r.levels_a, r.levels_b) == (10, 2, 2)
    assert r.chi2 == pytest.approx(10.0, abs=1e-6)
    assert r.v == pytest.approx(1.0, abs=1e-6)


def test_cramers_v_independence(spark):
    # uniform 2x2 -> observed == expected -> chi2 = 0, v = 0
    rows = [(a, b) for a in "ab" for b in "xy" for _ in range(3)]
    df = spark.createDataFrame(rows, "u string, w string")
    r = cramers_v(df, "u", "w").collect()[0]
    assert r.chi2 == pytest.approx(0.0, abs=1e-6)
    assert r.v == pytest.approx(0.0, abs=1e-6)


def test_cramers_v_constant_column_null(spark):
    rows = [("a", "x"), ("a", "y"), ("a", "x")]
    df = spark.createDataFrame(rows, "u string, w string")
    r = cramers_v(df, "u", "w").collect()[0]
    assert r.levels_a == 1 and r.v is None


# ------------------------------------------------------------ wasserstein_1d


def test_wasserstein_pure_shift(spark):
    # B = A + 1 pointwise -> transport cost exactly 1
    rows = [("a", 0.0), ("a", 1.0), ("b", 1.0), ("b", 2.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = wasserstein_1d(df, "g", "v", "a", "b").collect()[0]
    assert (r.n_a, r.n_b) == (2, 2)
    assert r.w1 == pytest.approx(1.0, abs=1e-6)


def test_wasserstein_identical_groups_zero(spark):
    rows = [("a", v) for v in (1.0, 2.0, 5.0)] + [
        ("b", v) for v in (1.0, 2.0, 5.0)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    r = wasserstein_1d(df, "g", "v", "a", "b").collect()[0]
    assert r.w1 == pytest.approx(0.0, abs=1e-6)


def test_wasserstein_hand_case(spark):
    # A = {0}, B = {3}: W1 = 3 (one unit of mass moved 3)
    rows = [("a", 0.0), ("b", 3.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = wasserstein_1d(df, "g", "v", "a", "b").collect()[0]
    assert r.w1 == pytest.approx(3.0, abs=1e-6)


def test_wasserstein_ignores_other_groups(spark):
    rows = [("a", 0.0), ("b", 2.0), ("c", 99.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = wasserstein_1d(df, "g", "v", "a", "b").collect()[0]
    assert (r.n_a, r.n_b) == (1, 1)
    assert r.w1 == pytest.approx(2.0, abs=1e-6)


# ------------------------------------------------------------ good_turing


def test_good_turing_hand_counts(spark):
    # corpus "a a b b c": counts a=2, b=2, c=1 -> N_1=1, N_2=2, N=5
    # r=1: r* = 2*N_2/N_1 = 4, p_mass = 1/5
    # r=2: no N_3 -> r* NULL, p_mass = 4/5
    df = spark.createDataFrame([("a a b b c",)], "text string")
    rows = {r.r: r for r in good_turing(df, "text").collect()}
    assert set(rows) == {1, 2}
    assert rows[1].n_r == 1 and rows[1].r_star == pytest.approx(4.0)
    assert rows[1].p_mass == pytest.approx(0.2, abs=1e-6)
    assert rows[2].n_r == 2 and rows[2].r_star is None
    assert rows[2].p_mass == pytest.approx(0.8, abs=1e-6)


def test_good_turing_tokenizer_and_order(spark):
    # tokenization is the corpus-wide lower/[^a-z0-9]+ convention;
    # output ordered by r ascending
    df = spark.createDataFrame([("The THE the; dog!",)], "text string")
    out = good_turing(df, "text").collect()
    assert [r.r for r in out] == [1, 3]  # dog x1, the x3


# ------------------------------------------------------------ keyness_llr


def _g2(a: int, b: int, ta: int, tb: int) -> float:
    ea = ta * (a + b) / (ta + tb)
    eb = tb * (a + b) / (ta + tb)
    g = 0.0
    if a:
        g += a * math.log(a / ea)
    if b:
        g += b * math.log(b / eb)
    return 2 * g


def test_keyness_exclusive_term_direction(spark):
    rows = [("only here unique", 1), ("shared shared common", 0)]
    df = spark.createDataFrame(rows, "text string, f int")
    out = {r.term: r for r in keyness_llr(df, "text", "f", k=10).collect()}
    assert out["unique"].direction == 1 and out["unique"].g2 > 0
    assert out["shared"].direction == -1 and out["shared"].g2 > 0


def test_keyness_proportion_matched_term_zero(spark):
    # "x" is 1/2 of corpus A and 1/2 of corpus B -> expected == observed
    rows = [("x y", 1), ("x z", 0)]
    df = spark.createDataFrame(rows, "text string, f int")
    out = {r.term: r for r in keyness_llr(df, "text", "f", k=10).collect()}
    assert out["x"].g2 == pytest.approx(0.0, abs=1e-6)
    assert (out["x"].count_a, out["x"].count_b) == (1, 1)


def test_keyness_matches_reference_formula(spark):
    rows = [("a a a b", 1), ("b b b b a", 0)]
    df = spark.createDataFrame(rows, "text string, f int")
    out = {r.term: r for r in keyness_llr(df, "text", "f", k=10).collect()}
    # totals: A = 4, B = 5; term a: (3, 1); term b: (1, 4)
    assert out["a"].g2 == pytest.approx(round(_g2(3, 1, 4, 5), 6), abs=1e-6)
    assert out["b"].g2 == pytest.approx(round(_g2(1, 4, 4, 5), 6), abs=1e-6)


def test_keyness_topk_bounds_output(spark):
    rows = [(" ".join(f"t{i}" for i in range(30)), 1), ("t0 other", 0)]
    df = spark.createDataFrame(rows, "text string, f int")
    assert keyness_llr(df, "text", "f", k=5).count() == 5


# ------------------------------------------------------------ hits_scores


def test_hits_bipartite_hand_iteration(spark):
    # edges 1->10, 2->10, 2->11; hub0 = 1 everywhere
    # a1: 10:2, 11:1 | h1: 1:2, 2:3 | a2: 10:5, 11:3 | h2: 1:5, 2:8
    # L1 readout: sh = 13, sa = 8
    df = spark.createDataFrame(
        [(1, 10), (2, 10), (2, 11)], "src long, dst long"
    )
    out = {r.node: r for r in hits_scores(df, iters=2).collect()}
    assert set(out) == {1, 2, 10, 11}
    assert out[1].hub == pytest.approx(round(5 / 13, 6), abs=1e-6)
    assert out[2].hub == pytest.approx(round(8 / 13, 6), abs=1e-6)
    assert out[10].auth == pytest.approx(round(5 / 8, 6), abs=1e-6)
    assert out[11].auth == pytest.approx(round(3 / 8, 6), abs=1e-6)
    # bipartite: sources are pure hubs, sinks pure authorities
    assert out[10].hub == 0.0 and out[11].hub == 0.0
    assert out[1].auth == 0.0 and out[2].auth == 0.0


def test_hits_single_iteration_is_degree_readout(spark):
    # iters=1: auth ∝ in-degree, hub ∝ sum of successors' in-degrees
    df = spark.createDataFrame(
        [(1, 10), (2, 10), (2, 11)], "src long, dst long"
    )
    out = {r.node: r for r in hits_scores(df, iters=1).collect()}
    assert out[10].auth == pytest.approx(round(2 / 3, 6), abs=1e-6)
    assert out[11].auth == pytest.approx(round(1 / 3, 6), abs=1e-6)
    assert out[1].hub == pytest.approx(round(2 / 5, 6), abs=1e-6)
    assert out[2].hub == pytest.approx(round(3 / 5, 6), abs=1e-6)


def test_hits_rejects_zero_iters(spark):
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        hits_scores(df, iters=0)


def test_hits_ordered_by_node(spark):
    df = spark.createDataFrame(
        [(5, 1), (3, 1), (4, 2)], "src long, dst long"
    )
    nodes = [r.node for r in hits_scores(df, iters=2).collect()]
    assert nodes == sorted(nodes)
