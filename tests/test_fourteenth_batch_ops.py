"""Behavioral tests for the fourteenth-batch operators: Fleiss' kappa,
Qini AUUC, McNemar's test, event affinity, embedding separability, and
rank-biased overlap — known-answer cases the oracle suite can't reach
(textbook perfect/chance agreement, a hand-computed uplift curve,
degenerate-discordance contracts, planted co-occurrence, separated vs
shuffled clouds, and identical/disjoint list overlap).
"""

from __future__ import annotations

import math

import pytest

from hdp_tez_spark.extensions.analytics import event_affinity
from hdp_tez_spark.extensions.experiments import (
    fleiss_kappa,
    mcnemar_test,
    qini_auuc,
)
from hdp_tez_spark.extensions.ranking import rank_overlap
from hdp_tez_spark.extensions.similarity import embedding_separability


# ------------------------------------------------------------ fleiss_kappa


def test_fleiss_kappa_perfect_agreement(spark):
    # every item rated twice, both raters always agree -> P_bar = 1
    rows = [(i, f"c{i % 3}") for i in range(9) for _ in range(2)]
    df = spark.createDataFrame(rows, "item long, cat string")
    r = fleiss_kappa(df, "item", "cat").collect()[0]
    assert r.p_bar == 1.0 and r.kappa == 1.0
    assert (r.n_items, r.n_ratings) == (9, 18)


def test_fleiss_kappa_single_category_is_null(spark):
    rows = [(i, "only") for i in range(4) for _ in range(3)]
    df = spark.createDataFrame(rows, "item long, cat string")
    r = fleiss_kappa(df, "item", "cat").collect()[0]
    assert r.p_e == 1.0 and r.kappa is None


def test_fleiss_kappa_textbook_hand_case(spark):
    # two items, 3 ratings each: item0 = a,a,b; item1 = a,b,b
    # P_0 = P_1 = (4+1-3)/(3*2) ... per item: sum n_ij^2 = 4+1 = 5;
    # P_i = (5-3)/6 = 1/3; P_bar = 1/3; p_a = p_b = 0.5 -> P_e = 0.5
    rows = [(0, "a"), (0, "a"), (0, "b"), (1, "a"), (1, "b"), (1, "b")]
    df = spark.createDataFrame(rows, "item long, cat string")
    r = fleiss_kappa(df, "item", "cat").collect()[0]
    assert r.p_bar == pytest.approx(1 / 3, abs=1e-6)
    assert r.p_e == pytest.approx(0.5, abs=1e-6)
    assert r.kappa == pytest.approx((1 / 3 - 0.5) / 0.5, abs=1e-6)


def test_fleiss_kappa_drops_single_rating_items(spark):
    rows = [(0, "a"), (1, "a"), (1, "b")]
    df = spark.createDataFrame(rows, "item long, cat string")
    r = fleiss_kappa(df, "item", "cat").collect()[0]
    assert (r.n_items, r.n_ratings) == (1, 2)


# ------------------------------------------------------------ qini_auuc


def test_qini_auuc_hand_computed(spark):
    # ranked by score desc: (t=1,y=1), (t=0,y=0), (t=1,y=0), (t=0,y=1)
    rows = [(1, 1, 1, 4.0), (2, 0, 0, 3.0), (3, 1, 0, 2.0), (4, 0, 1, 1.0)]
    df = spark.createDataFrame(rows, "id long, tr int, y int, s double")
    r = qini_auuc(df, "id", "tr", "y", "s").collect()[0]
    # depth 1: yt=1, nc=0 -> 1
    # depth 2: yt=1 - 0*(1/1) = 1
    # depth 3: yt=1 - 0*(2/1) = 1
    # depth 4: yt=1 - 1*(2/2) = 0
    assert (r.n, r.n_treat, r.n_ctrl) == (4, 2, 2)
    assert r.auuc == pytest.approx((1 + 1 + 1 + 0) / 4, abs=1e-6)


def test_qini_auuc_perfect_uplift_beats_reversed(spark):
    # treated responders get the highest scores -> high AUUC; the
    # reversed scoring must do strictly worse
    rows = []
    for i in range(20):
        t = i % 2
        y = 1 if (t == 1 and i < 10) else 0
        rows.append((i, t, y, float(100 - i)))
    df = spark.createDataFrame(rows, "id long, tr int, y int, s double")
    good = qini_auuc(df, "id", "tr", "y", "s").collect()[0].auuc
    flipped = df.withColumn("s", -df.s)
    bad = qini_auuc(flipped, "id", "tr", "y", "s").collect()[0].auuc
    assert good > bad


# ------------------------------------------------------------ mcnemar_test


def test_mcnemar_hand_computed(spark):
    # b (a_only) = 6, c (b_only) = 2 -> (|6-2|-1)^2 / 8 = 9/8
    rows = (
        [(1, 1)] * 5 + [(0, 0)] * 3 + [(1, 0)] * 6 + [(0, 1)] * 2
    )
    df = spark.createDataFrame(rows, "a int, b int")
    r = mcnemar_test(df, "a", "b").collect()[0]
    assert (r.n, r.both_right, r.both_wrong, r.a_only, r.b_only) == (
        16, 5, 3, 6, 2
    )
    assert r.statistic == pytest.approx(9 / 8, abs=1e-6)


def test_mcnemar_no_discordance_is_null(spark):
    df = spark.createDataFrame([(1, 1), (0, 0)], "a int, b int")
    r = mcnemar_test(df, "a", "b").collect()[0]
    assert r.statistic is None


# ------------------------------------------------------------ event_affinity


def test_event_affinity_planted_cooccurrence(spark):
    # users 0-3: {x, y} always together; users 4-7: {x, z} -> (x,y)
    # lift = (4*8)/(8*4) = 1.0... make y rarer: y only with 0-1
    rows = []
    for u in range(8):
        rows.append((u, "x"))
    for u in range(2):
        rows.append((u, "y"))
    for u in range(4, 8):
        rows.append((u, "z"))
    df = spark.createDataFrame(rows, "u long, t string")
    out = {(r.type_a, r.type_b): r for r in event_affinity(df, ["u"], "t").collect()}
    xy = out[("x", "y")]
    # n_both=2, n_x=8, n_y=2, N=8 -> lift = 2*8/(8*2) = 1
    assert (xy.n_both, xy.n_a, xy.n_b) == (2, 8, 2)
    assert xy.lift == pytest.approx(1.0)
    # y and z never co-occur -> pair absent
    assert ("y", "z") not in out


def test_event_affinity_positive_and_negative_pmi(spark):
    # a,b always together (4 users); c alone (4 users); one user has all
    rows = []
    for u in range(4):
        rows += [(u, "a"), (u, "b")]
    for u in range(4, 8):
        rows.append((u, "c"))
    rows += [(8, "a"), (8, "b"), (8, "c")]
    df = spark.createDataFrame(rows, "u long, t string")
    out = {(r.type_a, r.type_b): r for r in event_affinity(df, ["u"], "t").collect()}
    ab = out[("a", "b")]
    # n_both=5, n_a=n_b=5, N=9 -> lift = 45/25 = 1.8 > 1
    assert ab.lift == pytest.approx(1.8, abs=1e-6)
    assert ab.pmi == pytest.approx(math.log2(1.8), abs=1e-6)
    ac = out[("a", "c")]
    # n_both=1, n_a=5, n_c=5 -> lift = 9/25 < 1 -> negative pmi
    assert ac.lift == pytest.approx(0.36, abs=1e-6)
    assert ac.pmi < 0


# ------------------------------------------------------------ embedding_separability


def test_embedding_separability_separated_vs_shuffled(spark):
    # two tight clouds far apart -> huge CH; same points with labels
    # shuffled across clouds -> CH near 0
    pts = []
    for i in range(10):
        pts.append((i, [10.0 + (i % 3) * 0.1, 0.0], 0))
        pts.append((100 + i, [-10.0 - (i % 3) * 0.1, 0.0], 1))
    good = spark.createDataFrame(pts, "vec_id long, embedding array<double>, label int")
    g = embedding_separability(good).collect()[0]
    assert g.n == 20 and g.k == 2
    assert g.calinski_harabasz > 1000

    # interleave: each label gets half of EACH cloud
    shuffled = [(i, v, (i % 4) // 2) for i, (_, v, _) in enumerate(pts)]
    bad = spark.createDataFrame(shuffled, "vec_id long, embedding array<double>, label int")
    b = embedding_separability(bad).collect()[0]
    assert b.calinski_harabasz < 1


def test_embedding_separability_scatter_identity(spark):
    # total scatter = within + between (exact decomposition)
    pts = [(1, [1.0, 2.0], 0), (2, [3.0, 4.0], 0), (3, [5.0, 0.0], 1)]
    df = spark.createDataFrame(pts, "vec_id long, embedding array<double>, label int")
    r = embedding_separability(df).collect()[0]
    vecs = [v for _, v, _ in pts]
    mu = [sum(v[d] for v in vecs) / 3 for d in range(2)]
    total = sum((v[d] - mu[d]) ** 2 for v in vecs for d in range(2))
    assert r.within_ss + r.between_ss == pytest.approx(total, abs=1e-3)


# ------------------------------------------------------------ rank_overlap


def _ranked(spark, ids):
    return spark.createDataFrame(
        [(x, i + 1) for i, x in enumerate(ids)], "item long, r int"
    )


def test_rank_overlap_identical_lists(spark):
    a = _ranked(spark, range(20))
    r = rank_overlap(a, _ranked(spark, range(20)), "item", "r", p=0.9, k=20).collect()[0]
    # identical lists: X_d = d -> rbo = (1-p) * sum p^(d-1) = 1 - p^k
    assert r.n_common == 20
    assert r.rbo == pytest.approx(1 - 0.9**20, abs=1e-6)


def test_rank_overlap_disjoint_and_head_weighting(spark):
    a = _ranked(spark, range(20))
    b = _ranked(spark, range(100, 120))
    r = rank_overlap(a, b, "item", "r").collect()[0]
    assert r.n_common == 0 and r.rbo == 0.0
    # sharing the head is worth more than sharing the tail
    head = list(range(10)) + list(range(200, 210))
    tail = list(range(300, 310)) + list(range(10, 20))
    rh = rank_overlap(a, _ranked(spark, head), "item", "r").collect()[0].rbo
    rt = rank_overlap(a, _ranked(spark, tail), "item", "r").collect()[0].rbo
    assert rh > rt > 0


def test_rank_overlap_validation(spark):
    a = _ranked(spark, range(5))
    with pytest.raises(ValueError):
        rank_overlap(a, a, "item", "r", p=1.0)
    with pytest.raises(ValueError):
        rank_overlap(a, a, "item", "r", k=0)
