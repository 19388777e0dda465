"""Behavioral tests for the eighth-batch operators: k-core peeling,
Wald SPRT, binary-segmentation change-point localization, rolling
correlation, OOV-rate audit, and exact weighted quantiles —
known-answer cases the oracle suite can't reach (clique-vs-chain
peeling, hand-computed LLR boundaries, planted level shifts, perfectly
(anti)correlated series, hand-counted vocabularies, weighted medians
under skewed weights).
"""

from __future__ import annotations

import math

import pytest

from hdp_tez_spark.extensions.analytics import (
    best_split,
    rolling_corr,
    weighted_quantiles,
)
from hdp_tez_spark.extensions.experiments import sprt_check
from hdp_tez_spark.extensions.graph import k_core
from hdp_tez_spark.extensions.textstats import oov_rate


# ------------------------------------------------------------ k_core


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "a long, b long")


def test_k_core_keeps_clique_peels_chain(spark):
    # 4-clique (every degree 3) bridged to a chain; the chain and the
    # bridge peel away layer by layer, the clique survives k=3
    clique = [(10, 11), (10, 12), (10, 13), (11, 12), (11, 13), (12, 13)]
    chain = [(1, 2), (2, 3), (3, 4), (4, 10)]
    out = {r.node: r.degree for r in k_core(_edges(spark, clique + chain), k=3).collect()}
    assert out == {10: 3, 11: 3, 12: 3, 13: 3}


def test_k_core_whole_graph_peels_to_empty(spark):
    # triangle: every degree 2 < 3, one synchronized round kills it;
    # result is EMPTY with the right schema, not an error
    tri = [(1, 2), (2, 3), (1, 3)]
    out = k_core(_edges(spark, tri), k=3)
    assert out.count() == 0
    assert out.columns == ["node", "degree"]


def test_k_core_already_a_core_is_identity(spark):
    tri = [(1, 2), (2, 3), (1, 3)]
    out = {r.node: r.degree for r in k_core(_edges(spark, tri), k=2).collect()}
    assert out == {1: 2, 2: 2, 3: 2}


def test_k_core_dedups_and_ignores_self_loops(spark):
    # duplicate/reversed edges count once; self-loop adds no degree
    e = [(1, 2), (2, 1), (1, 2), (1, 1), (2, 3), (1, 3)]
    out = {r.node: r.degree for r in k_core(_edges(spark, e), k=2).collect()}
    assert out == {1: 2, 2: 2, 3: 2}


def test_k_core_round_budget_raises(spark):
    # max_rounds=1 cannot finish the two-layer peel of a 5-chain at k=2
    chain = [(1, 2), (2, 3), (3, 4), (4, 5)]
    with pytest.raises(RuntimeError, match="did not stabilize"):
        k_core(_edges(spark, chain), k=2, max_rounds=1)


# ------------------------------------------------------------ sprt_check


def test_sprt_hand_computed_llr_and_decisions(spark):
    # p0=0.5, p1=0.8, alpha=0.05, beta=0.2:
    # upper = ln(0.8/0.05) = ln 16, lower = ln(0.2/0.95)
    rows = (
        [("h1", 1)] * 9 + [("h1", 0)] * 1      # llr = 3.3137 -> accept_h1
        + [("mid", 1)] * 7 + [("mid", 0)] * 3  # llr = 0.5412 -> continue
        + [("h0", 0)] * 10                     # llr = -9.1629 -> accept_h0
    )
    df = spark.createDataFrame(rows, "g string, s int")
    out = {
        r.g: r
        for r in sprt_check(df, ["g"], "s", p0=0.5, p1=0.8).collect()
    }
    want_llr = 9 * math.log(0.8 / 0.5) + 1 * math.log(0.2 / 0.5)
    assert out["h1"].llr == pytest.approx(want_llr, abs=1e-6)
    assert out["h1"].upper == pytest.approx(math.log(16), abs=1e-6)
    assert out["h1"].lower == pytest.approx(math.log(0.2 / 0.95), abs=1e-6)
    assert out["h1"].decision == "accept_h1"
    assert out["mid"].decision == "continue"
    assert out["h0"].decision == "accept_h0"
    assert (out["h1"].n, out["h1"].successes) == (10, 9)


def test_sprt_rejects_bad_hypotheses(spark):
    df = spark.createDataFrame([("g", 1)], "g string, s int")
    with pytest.raises(ValueError):
        sprt_check(df, ["g"], "s", p0=0.5, p1=0.5)
    with pytest.raises(ValueError):
        sprt_check(df, ["g"], "s", p0=0.0, p1=0.5)


# ------------------------------------------------------------ best_split


def test_best_split_finds_planted_step(spark):
    rows = [("g", d, 0.0) for d in (1, 2, 3)] + [
        ("g", d, 10.0) for d in (4, 5, 6)
    ]
    df = spark.createDataFrame(rows, "g string, t int, y double")
    r = best_split(df, ["g"], "t", "y").collect()[0]
    assert r.split_after == 3
    assert (r.n_left, r.n_right) == (3, 3)
    assert r.mean_left == pytest.approx(0.0, abs=1e-9)
    assert r.mean_right == pytest.approx(10.0, abs=1e-9)
    assert r.score == pytest.approx(math.sqrt(3 * 3 / 6) * 10.0, abs=1e-6)


def test_best_split_constant_series_picks_earliest_and_zero_score(spark):
    df = spark.createDataFrame(
        [("g", d, 5.0) for d in range(1, 5)], "g string, t int, y double"
    )
    r = best_split(df, ["g"], "t", "y").collect()[0]
    assert r.split_after == 1  # all scores 0: tie -> earliest split
    assert r.score == pytest.approx(0.0, abs=1e-9)


def test_best_split_single_point_group_emits_nothing(spark):
    df = spark.createDataFrame(
        [("lone", 1, 3.0), ("ok", 1, 0.0), ("ok", 2, 9.0)],
        "g string, t int, y double",
    )
    out = {r.g: r for r in best_split(df, ["g"], "t", "y").collect()}
    assert set(out) == {"ok"}
    assert out["ok"].split_after == 1


# ------------------------------------------------------------ rolling_corr


def test_rolling_corr_perfect_and_anti_correlation(spark):
    rows = [("up", d, float(d), 2.0 * d + 3.0) for d in range(1, 11)] + [
        ("down", d, float(d), -1.5 * d + 40.0) for d in range(1, 11)
    ]
    df = spark.createDataFrame(rows, "g string, t int, x double, y double")
    out = {(r.g, r.t): r.r_xy for r in rolling_corr(df, ["g"], "t", "x", "y", window=7).collect()}
    for d in range(1, 7):  # partial frames report NULL
        assert out[("up", d)] is None
        assert out[("down", d)] is None
    for d in range(7, 11):  # full frames: exactly +/-1
        assert out[("up", d)] == pytest.approx(1.0, abs=1e-6)
        assert out[("down", d)] == pytest.approx(-1.0, abs=1e-6)


def test_rolling_corr_constant_series_is_null(spark):
    df = spark.createDataFrame(
        [("g", d, 5.0, float(d)) for d in range(1, 10)],
        "g string, t int, x double, y double",
    )
    out = rolling_corr(df, ["g"], "t", "x", "y", window=7).collect()
    assert all(r.r_xy is None for r in out)  # zero variance in x


def test_rolling_corr_null_in_frame_reports_null(spark):
    # 10 perfectly-correlated points, but x is NULL at t=5: every
    # 7-row frame containing t=5 (t=7..11) has only 6 usable pairs,
    # so it is NOT full and must report NULL — the r09 bug counted
    # frame rows with count(*) and emitted a wrong coefficient here.
    rows = [
        ("g", d, None if d == 5 else float(d), 2.0 * d + 3.0)
        for d in range(1, 15)
    ]
    df = spark.createDataFrame(rows, "g string, t int, x double, y double")
    out = {r.t: r.r_xy for r in rolling_corr(df, ["g"], "t", "x", "y", window=7).collect()}
    for d in range(1, 12):  # partial or NULL-contaminated frames
        assert out[d] is None, (d, out[d])
    for d in range(12, 15):  # frames past the NULL: full again, r=+1
        assert out[d] == pytest.approx(1.0, abs=1e-6)


def test_rolling_corr_rejects_tiny_window(spark):
    df = spark.createDataFrame([("g", 1, 1.0, 1.0)], "g string, t int, x double, y double")
    with pytest.raises(ValueError):
        rolling_corr(df, ["g"], "t", "x", "y", window=1)


# ------------------------------------------------------------ oov_rate


def test_oov_rate_counts_occurrences_not_types(spark):
    docs = spark.createDataFrame(
        [(1, "aa bb cc cc"), (2, "aa aa"), (3, "")],
        "doc_id long, text string",
    )
    vocab = spark.createDataFrame([("aa",), ("bb",)], "term string")
    out = {r.doc_id: r for r in oov_rate(docs, "doc_id", "text", vocab).collect()}
    # cc is OOV and occurs twice: both occurrences count
    assert (out[1].n_tokens, out[1].n_oov) == (4, 2)
    assert out[1].oov_rate == pytest.approx(0.5, abs=1e-6)
    assert (out[2].n_tokens, out[2].n_oov) == (2, 0)
    assert out[2].oov_rate == 0.0
    # empty doc reports 0s, not NULL, and is not dropped
    assert (out[3].n_tokens, out[3].n_oov, out[3].oov_rate) == (0, 0, 0.0)


def test_oov_rate_is_case_insensitive_both_sides(spark):
    docs = spark.createDataFrame([(1, "Foo BAR baz")], "doc_id long, text string")
    vocab = spark.createDataFrame([("FOO",), ("bar",)], "term string")
    r = oov_rate(docs, "doc_id", "text", vocab).collect()[0]
    assert (r.n_tokens, r.n_oov) == (3, 1)


# ------------------------------------------------------------ weighted_quantiles


def test_weighted_quantiles_hand_computed(spark):
    # values 1,2,3 with weights 1,1,2 (W=4): thresholds 1,2,3 ->
    # q25 -> 1 (cum 1), q50 -> 2 (cum 2), q75 -> 3 (prev 2 < 3 <= 4)
    df = spark.createDataFrame(
        [("g", 1, 1), ("g", 2, 1), ("g", 3, 2)], "g string, v int, w int"
    )
    out = {
        r.q: r.value
        for r in weighted_quantiles(df, ["g"], "v", "w", qs=(0.25, 0.5, 0.75, 1.0)).collect()
    }
    assert out == {0.25: 1, 0.5: 2, 0.75: 3, 1.0: 3}


def test_weighted_quantiles_heavy_weight_drags_the_median(spark):
    # unweighted median of 1..5 is 3; weight 100 on value 5 drags it
    df = spark.createDataFrame(
        [("g", v, 1) for v in (1, 2, 3, 4)] + [("g", 5, 100)],
        "g string, v int, w int",
    )
    out = {r.q: r.value for r in weighted_quantiles(df, ["g"], "v", "w", qs=(0.5,)).collect()}
    assert out == {0.5: 5}


def test_weighted_quantiles_drops_nonpositive_weights_and_validates_q(spark):
    df = spark.createDataFrame(
        [("g", 1, 0), ("g", 2, -3), ("g", 3, 1)], "g string, v int, w int"
    )
    out = weighted_quantiles(df, ["g"], "v", "w", qs=(0.5,)).collect()
    assert [(r.q, r.value) for r in out] == [(0.5, 3)]
    with pytest.raises(ValueError):
        weighted_quantiles(df, ["g"], "v", "w", qs=(0.0,))
