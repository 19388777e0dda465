"""Behavioral tests for the fifth-batch operators: sample-ratio-
mismatch gate, delta-method ratio-metric CI, Benjamini-Hochberg FDR
correction, common-neighbor/Adamic-Adar link prediction, NDCG@k
ranking evaluation, and the Zipf rank-frequency fit — known-answer
cases the sf0.001 oracle suite can't reach (hand-computed chi2 and BH
step-ups, planted graphs, textbook NDCG worked examples, numpy-checked
OLS fits, degenerate inputs).
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from hdp_tez_spark.extensions.experiments import (
    fdr_bh,
    normal_sf,
    ratio_metric_delta,
    srm_check,
)
from hdp_tez_spark.extensions.graph import link_prediction
from hdp_tez_spark.extensions.ranking import ndcg_eval, zipf_fit


# ---------------------------------------------------------------- srm_check


def test_srm_check_hand_computed_chi2(spark):
    # 40 control / 60 treatment under a 50/50 split:
    # chi2 = (40-50)^2/50 + (60-50)^2/50 = 4.0
    rows = [("g", "control")] * 40 + [("g", "treatment")] * 60
    df = spark.createDataFrame(rows, "grp string, arm string")
    out = srm_check(df, ["grp"], "arm", {"control": 1, "treatment": 1}).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n, r.n_control, r.n_treatment, r.dof) == (100, 40, 60, 1)
    assert r.chi2_stat == pytest.approx(4.0, abs=1e-9)


def test_srm_check_weighted_allocation_perfect_match_is_zero(spark):
    rows = [("g", "a")] * 30 + [("g", "b")] * 10
    df = spark.createDataFrame(rows, "grp string, arm string")
    r = srm_check(df, ["grp"], "arm", {"a": 3, "b": 1}).collect()[0]
    assert r.chi2_stat == 0.0


def test_srm_check_ignores_arms_outside_allocation(spark):
    rows = (
        [("g", "a")] * 5
        + [("g", "b")] * 5
        + [("g", "holdout")] * 90
        + [("h", "holdout")] * 7  # group with NO rows in the allocation
    )
    df = spark.createDataFrame(rows, "grp string, arm string")
    out = {r.grp: r for r in srm_check(df, ["grp"], "arm", {"a": 1, "b": 1}).collect()}
    # holdout rows are not part of the tested allocation
    r = out["g"]
    assert (r.n, r.n_a, r.n_b) == (10, 5, 5)
    assert r.chi2_stat == 0.0
    # n == 0 group: chi2 undefined, and no division may evaluate (ANSI)
    assert out["h"].n == 0
    assert out["h"].chi2_stat is None


def test_srm_check_rejects_single_arm():
    with pytest.raises(ValueError):
        srm_check(None, ["g"], "arm", {"only": 1.0})


# ------------------------------------------------------- ratio_metric_delta


def _delta_reference(xs, ys, z=1.959963984540054):
    x, y = np.asarray(xs, float), np.asarray(ys, float)
    n = len(x)
    ratio = y.sum() / x.sum()
    vx, vy = x.var(ddof=1), y.var(ddof=1)
    cxy = np.cov(x, y, ddof=1)[0, 1]
    var_r = (vy + ratio**2 * vx - 2 * ratio * cxy) / (n * x.mean() ** 2)
    se = math.sqrt(var_r)
    return ratio, se, ratio - z * se, ratio + z * se


def test_ratio_metric_delta_matches_numpy_reference(spark):
    xs = [10.0, 12.0, 8.0, 20.0, 5.0, 15.0]
    ys = [30.0, 40.0, 20.0, 90.0, 10.0, 50.0]
    df = spark.createDataFrame(
        [("g", x, y) for x, y in zip(xs, ys)], "grp string, x double, y double"
    )
    r = ratio_metric_delta(df, ["grp"], "y", "x").collect()[0]
    ratio, se, lo, hi = _delta_reference(xs, ys)
    assert r.n == 6
    assert r.ratio == pytest.approx(ratio, abs=1e-6)
    assert r.se == pytest.approx(se, abs=1e-6)
    assert r.ci_lo == pytest.approx(lo, abs=1e-6)
    assert r.ci_hi == pytest.approx(hi, abs=1e-6)


def test_ratio_metric_delta_excludes_null_units_and_degenerates(spark):
    df = spark.createDataFrame(
        [
            ("one", 4.0, 8.0),
            ("one", None, 9.0),  # null denominator: not an observation
            ("zero", 0.0, 1.0),  # sum(x) == 0: ratio undefined
            ("zero", 0.0, 2.0),
        ],
        "grp string, x double, y double",
    )
    out = {r.grp: r for r in ratio_metric_delta(df, ["grp"], "y", "x").collect()}
    assert out["one"].n == 1
    assert out["one"].ratio == 2.0
    assert out["one"].se is None  # n < 2
    assert out["zero"].ratio is None
    assert out["zero"].ci_lo is None


# ------------------------------------------------------- normal_sf / fdr_bh


def test_normal_sf_matches_erfc_tail(spark):
    zs = [-3.0, -1.5, -0.5, 0.0, 0.5, 1.0, 1.959964, 3.0, 5.0]
    df = spark.createDataFrame([(z,) for z in zs], "z double")
    got = {
        r.z: r.p for r in df.select("z", normal_sf(F.col("z")).alias("p")).collect()
    }
    for z in zs:
        exact = 0.5 * math.erfc(z / math.sqrt(2.0))
        # Zelen & Severo 26.2.17: |error| < 7.5e-8
        assert got[z] == pytest.approx(exact, abs=1e-7), z


def test_fdr_bh_textbook_step_up(spark):
    ps = {"t1": 0.01, "t2": 0.02, "t3": 0.03, "t4": 0.04, "t5": 0.5}
    df = spark.createDataFrame(list(ps.items()), "test string, p double")
    out = {r.test: r for r in fdr_bh(df, [], "test", "p", alpha=0.05).collect()}
    # p*m/rank = .05,.05,.05,.05,.5 -> suffix-min leaves them unchanged
    for t in ["t1", "t2", "t3", "t4"]:
        assert out[t].adj_p == pytest.approx(0.05, abs=1e-9)
        assert out[t].reject
    assert out["t5"].adj_p == pytest.approx(0.5, abs=1e-9)
    assert not out["t5"].reject
    assert out["t1"].p_rank == 1 and out["t5"].p_rank == 5
    assert all(r.m_tests == 5 for r in out.values())


def test_fdr_bh_suffix_min_and_cap(spark):
    # ranks: p*m/rank = [0.03*3/1=0.09, 0.9*3/2=1.35, 0.95*3/3=0.95]
    # suffix-min: [0.09, 0.95, 0.95]; the 1.35 is capped by a LATER rank
    df = spark.createDataFrame(
        [("a", 0.03), ("b", 0.9), ("c", 0.95)], "test string, p double"
    )
    out = {r.test: r.adj_p for r in fdr_bh(df, [], "test", "p").collect()}
    assert out["a"] == pytest.approx(0.09, abs=1e-9)
    assert out["b"] == pytest.approx(0.95, abs=1e-9)
    assert out["c"] == pytest.approx(0.95, abs=1e-9)


def test_fdr_bh_families_are_independent_and_nulls_excluded(spark):
    df = spark.createDataFrame(
        [("f1", "a", 0.04), ("f1", "b", 0.5), ("f2", "c", 0.04), ("f2", "d", None)],
        "fam string, test string, p double",
    )
    out = {(r.fam, r.test): r for r in fdr_bh(df, ["fam"], "test", "p").collect()}
    assert ("f2", "d") not in out
    assert out[("f1", "a")].m_tests == 2
    assert out[("f2", "c")].m_tests == 1
    # f2's lone test: adj = p * 1 / 1 = p
    assert out[("f2", "c")].adj_p == pytest.approx(0.04, abs=1e-9)
    assert out[("f2", "c")].reject


# --------------------------------------------------------- link_prediction


def test_link_prediction_four_cycle(spark):
    # 1-2-3-4-1: the two diagonals each share exactly 2 neighbors
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], "a bigint, b bigint"
    )
    out = link_prediction(df, min_common=2, top_n=10).collect()
    got = {(r.a, r.b): r for r in out}
    assert set(got) == {(1, 3), (2, 4)}
    for r in got.values():
        assert r.common_neighbors == 2
        assert r.adamic_adar == pytest.approx(2.0 / math.log(2.0), abs=1e-6)


def test_link_prediction_excludes_existing_edges_and_tolerates_dupes(spark):
    # triangle 1-2-3 plus pendant 4 on node 1; duplicate/reversed rows
    df = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 1), (1, 4), (4, 1), (1, 1)],
        "a bigint, b bigint",
    )
    out = link_prediction(df, min_common=1, top_n=10).collect()
    pairs = {(r.a, r.b) for r in out}
    # adjacent pairs never predicted; (2,4) and (3,4) share only node 1
    assert pairs == {(2, 4), (3, 4)}
    deg1 = 3.0  # node 1 neighbors: 2, 3, 4
    for r in out:
        assert r.common_neighbors == 1
        assert r.adamic_adar == pytest.approx(1.0 / math.log(deg1), abs=1e-6)


def test_link_prediction_max_degree_drops_hub_midpoints(spark):
    # star: all evidence flows through hub 0; capping below its degree
    # leaves no usable midpoint
    df = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "a bigint, b bigint"
    )
    assert link_prediction(df, min_common=1, max_degree=4).count() == 0
    # uncapped, every leaf pair is a candidate through the hub
    assert link_prediction(df, min_common=1, top_n=100).count() == 10


def test_link_prediction_ranking_is_integer_ordered(spark):
    # K4 minus edge (1,4) plus path 5-6-7: (1,4) has 2 common, (5,7) has 1
    df = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4), (5, 6), (6, 7)],
        "a bigint, b bigint",
    )
    out = link_prediction(df, min_common=1, top_n=1).collect()
    assert [(r.a, r.b, r.common_neighbors) for r in out] == [(1, 4, 2)]


# --------------------------------------------------------------- ndcg_eval


def test_ndcg_eval_worked_example(spark):
    ranked = spark.createDataFrame(
        [("q", "d1", 0.9), ("q", "d2", 0.8), ("q", "d3", 0.7)],
        "query string, id string, score double",
    )
    labels = spark.createDataFrame(
        # d1 unjudged (counts 0); d4 judged but unranked (shapes IDCG only)
        [("q", "d2", 3), ("q", "d3", 1), ("q", "d4", 2)],
        "query string, id string, rel int",
    )
    r = ndcg_eval(ranked, labels, "query", "id", "rel", k=3).collect()[0]
    dcg = 3 / math.log2(3) + 1 / math.log2(4)
    idcg = 3 / math.log2(2) + 2 / math.log2(3) + 1 / math.log2(4)
    assert r.dcg == pytest.approx(dcg, abs=1e-6)
    assert r.idcg == pytest.approx(idcg, abs=1e-6)
    assert r.ndcg == pytest.approx(dcg / idcg, abs=1e-6)


def test_ndcg_eval_perfect_ranking_is_one(spark):
    ranked = spark.createDataFrame(
        [("q", "a", 3.0), ("q", "b", 2.0), ("q", "c", 1.0)],
        "query string, id string, score double",
    )
    labels = spark.createDataFrame(
        [("q", "a", 3), ("q", "b", 2), ("q", "c", 1)],
        "query string, id string, rel int",
    )
    r = ndcg_eval(ranked, labels, "query", "id", "rel", k=10).collect()[0]
    assert r.ndcg == pytest.approx(1.0, abs=1e-9)


def test_ndcg_eval_no_positive_labels_is_null(spark):
    ranked = spark.createDataFrame(
        [("q", "a", 1.0)], "query string, id string, score double"
    )
    labels = spark.createDataFrame([], "query string, id string, rel int")
    r = ndcg_eval(ranked, labels, "query", "id", "rel").collect()[0]
    assert r.dcg == 0.0
    assert r.idcg is None and r.ndcg is None


def test_ndcg_eval_rank_col_overrides_score_order(spark):
    # retriever-provided ranks deliberately disagree with the scores;
    # positions must follow rank_col
    ranked = spark.createDataFrame(
        [("q", "good", 0.1, 1), ("q", "bad", 0.9, 2)],
        "query string, id string, score double, rn int",
    )
    labels = spark.createDataFrame(
        [("q", "good", 1)], "query string, id string, rel int"
    )
    r = ndcg_eval(
        ranked, labels, "query", "id", "rel", rank_col="rn", k=2
    ).collect()[0]
    assert r.ndcg == pytest.approx(1.0, abs=1e-9)


# ---------------------------------------------------------------- zipf_fit


def _docs(spark, counts: dict[str, int]):
    text = " ".join(" ".join([t] * c) for t, c in counts.items())
    return spark.createDataFrame([(text,)], "text string")


def test_zipf_fit_matches_numpy_ols(spark):
    counts = {"a": 64, "b": 23, "c": 11, "d": 7, "e": 3, "f": 2}
    r = zipf_fit(_docs(spark, counts), "text").collect()[0]
    cnts = sorted(counts.values(), reverse=True)
    x = np.log(np.arange(1, len(cnts) + 1))
    y = np.log(np.array(cnts, float))
    slope, intercept = np.polyfit(x, y, 1)
    r2 = np.corrcoef(x, y)[0, 1] ** 2
    assert r.n_types == 6
    assert r.n_tokens == sum(counts.values())
    assert r.slope == pytest.approx(slope, abs=1e-6)
    assert r.intercept == pytest.approx(intercept, abs=1e-6)
    assert r.r2 == pytest.approx(r2, abs=1e-6)


def test_zipf_fit_min_count_drops_hapaxes(spark):
    counts = {"a": 5, "b": 3, "hapax1": 1, "hapax2": 1}
    r = zipf_fit(_docs(spark, counts), "text", min_count=2).collect()[0]
    assert r.n_types == 2
    assert r.n_tokens == 8


def test_zipf_fit_degenerate_vocabularies(spark):
    # single type: no spread in rank -> fit undefined
    r = zipf_fit(_docs(spark, {"only": 9}), "text").collect()[0]
    assert r.n_types == 1
    assert r.slope is None and r.intercept is None and r.r2 is None
    # equal counts: flat curve -> slope 0; r2 is NULL (exact zero
    # variance) or 0.0 (float residue in n*syy - sy*sy) — both mean
    # "no explained variance"
    r = zipf_fit(_docs(spark, {"a": 4, "b": 4, "c": 4}), "text").collect()[0]
    assert r.slope == 0.0
    assert r.r2 in (None, 0.0)
    # vocabulary empty after min_count: the n=0 aggregate row must not
    # evaluate any division (ANSI)
    r = zipf_fit(_docs(spark, {"hapax": 1}), "text", min_count=2).collect()[0]
    assert r.n_types == 0
    assert r.slope is None and r.intercept is None and r.r2 is None


def test_zipf_fit_exact_power_law_r2_is_one(spark):
    # counts = round(C * rank^-1) with C chosen so every value is exact:
    # 24/1, 24/2, 24/3, 24/4 -> perfectly linear in log-log
    counts = {"w1": 24, "w2": 12, "w3": 8, "w4": 6}
    r = zipf_fit(_docs(spark, counts), "text").collect()[0]
    assert r.r2 == pytest.approx(1.0, abs=1e-6)
    assert r.slope == pytest.approx(-1.0, abs=1e-6)
