"""Behavioral tests for the sixth-batch operators: Kaplan-Meier
survival curves, difference-in-differences, synchronous label
propagation, and RAKE keyword extraction — known-answer cases the
oracle suite can't reach (textbook survival worked examples with
censoring, hand-computed DiD cells, a pure-Python LPA reference on
seeded graphs, hand-scored RAKE phrases).
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from hdp_tez_spark.extensions.analytics import kaplan_meier
from hdp_tez_spark.extensions.experiments import diff_in_diff
from hdp_tez_spark.extensions.graph import label_propagation
from hdp_tez_spark.extensions.ranking import rake_keywords


# ------------------------------------------------------------ kaplan_meier


def test_kaplan_meier_textbook_curve_with_censoring(spark):
    # events at t=1 (1 of 6), t=3 (2 of 4 at risk after a censor at 2),
    # t=5 (1 of 1 after a censor at 4): S = 5/6, 5/12, then exactly 0
    rows = [(1, 1), (2, 0), (3, 1), (3, 1), (4, 0), (5, 1)]
    df = spark.createDataFrame([("g", t, e) for t, e in rows], "g string, t int, ev int")
    out = {r.t: r for r in kaplan_meier(df, ["g"], "t", "ev").collect()}
    assert set(out) == {1, 3, 5}  # censor-only times emit no row
    assert (out[1].n_risk, out[1].n_event, out[1].n_censored) == (6, 1, 0)
    assert out[1].survival == pytest.approx(5 / 6, abs=1e-6)
    assert (out[3].n_risk, out[3].n_event) == (4, 2)
    assert out[3].survival == pytest.approx(5 / 12, abs=1e-6)
    # the last at-risk subject dies: survival is EXACTLY zero, not
    # exp(-inf) artifacts
    assert (out[5].n_risk, out[5].survival) == (1, 0.0)


def test_kaplan_meier_censoring_shrinks_risk_set_not_survival(spark):
    # all-event vs half-censored: censored subjects must not count as
    # survivors-forever nor as events
    df = spark.createDataFrame(
        [("a", 1, 1), ("a", 1, 1), ("a", 2, 1), ("a", 2, 1)]
        + [("b", 1, 1), ("b", 1, 0), ("b", 2, 1), ("b", 2, 0)],
        "g string, t int, ev int",
    )
    out = {(r.g, r.t): r for r in kaplan_meier(df, ["g"], "t", "ev").collect()}
    assert out[("a", 2)].survival == pytest.approx(0.0, abs=1e-9)
    # b: S(1) = 1 - 1/4 = 0.75; at t=2 risk set is 2 (one censored at 1)
    assert out[("b", 1)].survival == pytest.approx(0.75, abs=1e-6)
    assert out[("b", 2)].n_risk == 2
    assert out[("b", 2)].survival == pytest.approx(0.75 * 0.5, abs=1e-6)


def test_kaplan_meier_all_censored_group_is_empty(spark):
    df = spark.createDataFrame(
        [("g", 3, 0), ("g", 5, 0)], "g string, t int, ev int"
    )
    assert kaplan_meier(df, ["g"], "t", "ev").count() == 0


# ------------------------------------------------------------ diff_in_diff


def test_diff_in_diff_hand_computed(spark):
    # treated: pre mean 10, post mean 15 (+5); control: 20 -> 22 (+2)
    # DiD = 3; noise-free within-cell variance 2*0.25 spread
    cells = {
        (True, False): [9.5, 10.5, 10.0, 10.0],
        (True, True): [14.5, 15.5, 15.0, 15.0],
        (False, False): [19.5, 20.5, 20.0, 20.0],
        (False, True): [21.5, 22.5, 22.0, 22.0],
    }
    rows = [
        ("m", tr, po, v) for (tr, po), vs in cells.items() for v in vs
    ]
    df = spark.createDataFrame(rows, "g string, treat boolean, post boolean, v double")
    r = diff_in_diff(df, ["g"], "treat", "post", "v").collect()[0]
    assert (r.n_tp, r.n_tq, r.n_cp, r.n_cq) == (4, 4, 4, 4)
    assert r.did == pytest.approx(3.0, abs=1e-9)
    var_n = np.var([9.5, 10.5, 10.0, 10.0], ddof=1) / 4
    se = math.sqrt(4 * var_n)  # identical spread in every cell
    assert r.se == pytest.approx(se, abs=1e-6)
    assert r.ci_lo == pytest.approx(3.0 - 1.959963984540054 * se, abs=1e-6)
    assert r.ci_hi == pytest.approx(3.0 + 1.959963984540054 * se, abs=1e-6)


def test_diff_in_diff_degenerate_cell_nulls_se(spark):
    df = spark.createDataFrame(
        [("g", True, True, 1.0), ("g", True, False, 2.0),
         ("g", False, True, 3.0), ("g", False, False, 4.0)],
        "g string, treat boolean, post boolean, v double",
    )
    r = diff_in_diff(df, ["g"], "treat", "post", "v").collect()[0]
    # every cell has n=1: the point estimate is defined, the SE is not
    assert r.did == pytest.approx((1.0 - 2.0) - (3.0 - 4.0), abs=1e-9)
    assert r.se is None and r.ci_lo is None and r.ci_hi is None


def test_diff_in_diff_empty_cell_nulls_estimate(spark):
    df = spark.createDataFrame(
        [("g", True, True, 1.0), ("g", True, False, 2.0),
         ("g", False, True, 3.0)],  # control-pre cell empty
        "g string, treat boolean, post boolean, v double",
    )
    r = diff_in_diff(df, ["g"], "treat", "post", "v").collect()[0]
    assert r.n_cq == 0
    assert r.did is None and r.se is None


# ------------------------------------------------------- label_propagation


def _lpa_reference(edges: list[tuple[int, int]], iters: int) -> dict[int, int]:
    """Pure-Python synchronous LPA with the same deterministic rule:
    most frequent neighbor label, ties to the smallest label."""
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    labels = {n: n for n in adj}
    for _ in range(iters):
        new = {}
        for n, nbrs in adj.items():
            counts: dict[int, int] = {}
            for m in nbrs:
                counts[labels[m]] = counts.get(labels[m], 0) + 1
            best = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            new[n] = best
        labels = new
    return labels


def test_label_propagation_two_triangles_with_bridge(spark):
    edges = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]
    df = spark.createDataFrame(edges, "a bigint, b bigint")
    got = {r.node: r.label for r in label_propagation(df, iters=3).collect()}
    assert got == _lpa_reference(edges, 3)
    # the two triangle cores end in different communities
    assert got[1] == got[2] and got[5] == got[6]
    assert got[1] != got[6]


def test_label_propagation_matches_python_reference_on_seeded_graph(spark):
    rng = np.random.RandomState(11)
    n = 40
    edges = sorted(
        {
            (int(min(u, v)), int(max(u, v)))
            for u, v in rng.randint(0, n, size=(120, 2))
            if u != v
        }
    )
    df = spark.createDataFrame(edges, "a bigint, b bigint")
    for iters in (1, 2, 3):
        got = {
            r.node: r.label
            for r in label_propagation(df, iters=iters).collect()
        }
        assert got == _lpa_reference(edges, iters), iters


def test_label_propagation_drops_self_loops_and_dupes(spark):
    df = spark.createDataFrame(
        [(1, 1), (1, 2), (2, 1), (1, 2)], "a bigint, b bigint"
    )
    got = {r.node: r.label for r in label_propagation(df, iters=2).collect()}
    # the 1-2 pair swaps labels every sync round: after 2 rounds, back home
    assert got == {1: 1, 2: 2}


# ----------------------------------------------------------- rake_keywords


def test_rake_keywords_hand_scored(spark):
    # stopword 'of' splits two phrases sharing 'deep':
    # freq(deep)=2 deg(deep)=4; learning/models freq 1 deg 2
    # score(deep learning) = 4/2 + 2/1 = 4.0 (same for deep models)
    df = spark.createDataFrame(
        [(1, "deep learning of deep models")], "doc_id bigint, text string"
    )
    out = rake_keywords(df, "doc_id", "text", stopwords=["of"]).collect()
    assert [(r.phrase, r.n, r.score) for r in out] == [
        ("deep learning", 1, 4.0),
        ("deep models", 1, 4.0),
    ]


def test_rake_keywords_counts_repeats_and_caps_length(spark):
    df = spark.createDataFrame(
        [
            (1, "fast merge and fast merge"),
            (2, "one two three four five and more"),
        ],
        "doc_id bigint, text string",
    )
    out = {
        r.phrase: r
        for r in rake_keywords(
            df, "doc_id", "text", stopwords=["and"], max_phrase_len=4
        ).collect()
    }
    # the 5-token run and its 2-token sibling from doc 2 are dropped/kept
    assert "one two three four five" not in out
    assert out["fast merge"].n == 2
    # fast: freq 2, deg 4; merge: freq 2, deg 4 -> score 2 + 2 = 4
    assert out["fast merge"].score == pytest.approx(4.0, abs=1e-6)


def test_rake_keywords_stopword_only_text_is_empty(spark):
    df = spark.createDataFrame(
        [(1, "the of and the")], "doc_id bigint, text string"
    )
    assert rake_keywords(df, "doc_id", "text").count() == 0
