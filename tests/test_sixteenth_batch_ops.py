"""Behavioral tests for the sixteenth-batch operators: Brown-Forsythe
Levene test, Friedman rank test, Cochran's Q, one-way ICC, the
Wald-Wolfowitz runs test, and isotonic (PAV) calibration — known-answer
cases the oracle suite can't reach (equal-spread null behavior,
hand-ranked complete blocks, textbook discordance tables, perfect
between-group separation, alternating/clustered sign patterns, and
pooled-violator step functions).
"""

from __future__ import annotations

import pytest

from hdp_tez_spark.extensions.analytics import runs_test
from hdp_tez_spark.extensions.experiments import (
    cochran_q,
    friedman_test,
    icc_oneway,
    isotonic_calibration,
    levene_test,
)


# ------------------------------------------------------------ levene_test


def test_levene_identical_spreads_zero(spark):
    # same deviations-from-median in both groups -> W = 0
    rows = [("a", 0.0), ("a", 2.0), ("a", 4.0), ("b", 10.0), ("b", 12.0), ("b", 14.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = levene_test(df, "g", "v").collect()[0]
    assert (r.n_groups, r.n) == (2, 6)
    assert r.w_stat == pytest.approx(0.0, abs=1e-6)


def test_levene_detects_spread_difference(spark):
    rows = [("a", 0.0), ("a", 0.1), ("a", -0.1), ("b", -10.0), ("b", 0.0), ("b", 10.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = levene_test(df, "g", "v").collect()[0]
    assert r.w_stat is not None and r.w_stat > 1.0


def test_levene_median_centering(spark):
    # group a = {0, 0, 9}: median 0 -> z = {0, 0, 9} (mean-centered
    # Levene would give z = {3, 3, 6}); verify via the exact W value
    # W = F on z over groups a and b = {1, 1, 1} (z = 0, 0, 0)
    rows = [("a", 0.0), ("a", 0.0), ("a", 9.0), ("b", 1.0), ("b", 1.0), ("b", 1.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = levene_test(df, "g", "v").collect()[0]
    # z_a = 0,0,9 (mean 3), z_b = 0,0,0; SSB = 3*(3-1.5)^2*2 = 13.5
    # SSW = (9+9+36) = 54; F = (13.5/1)/(54/4) = 1.0
    assert r.w_stat == pytest.approx(1.0, abs=1e-6)


# ------------------------------------------------------------ friedman_test


def test_friedman_consistent_ordering_max_stat(spark):
    # 3 blocks, 3 treatments, identical ordering everywhere:
    # ranks 1,2,3 per block -> R = (3,6,9); no ties
    # Q = 12/(n k (k+1)) * sum R^2 - 3 n (k+1) = 12/36*126 - 36 = 6
    rows = []
    for b in range(3):
        for j, t in enumerate("xyz"):
            rows += [(b, t)] * (j + 1)  # counts 1, 2, 3
    df = spark.createDataFrame(rows, "b long, t string")
    r = friedman_test(df, "b", "t").collect()[0]
    assert (r.n_blocks, r.k_treatments) == (3, 3)
    assert r.q_stat == pytest.approx(6.0, abs=1e-6)


def test_friedman_all_tied_null(spark):
    # every block has equal counts everywhere -> all mid-ranks equal
    rows = [(b, t) for b in range(3) for t in "xyz"]
    df = spark.createDataFrame(rows, "b long, t string")
    r = friedman_test(df, "b", "t").collect()[0]
    assert r.q_stat is None


def test_friedman_drops_incomplete_blocks(spark):
    rows = [(0, "x"), (0, "y"), (1, "x")]  # block 1 lacks y
    df = spark.createDataFrame(rows, "b long, t string")
    r = friedman_test(df, "b", "t").collect()[0]
    assert r.n_blocks == 1


# ------------------------------------------------------------ cochran_q


def test_cochran_textbook_hand_case(spark):
    # 4 subjects x 3 treatments, successes:
    # s0: 1,1,0  s1: 1,0,0  s2: 1,1,1  s3: 0,0,0
    # C = (3,2,1), T = 6, R = (2,1,3,0), sum R^2 = 14
    # Q = 3*2*[(3-2)^2+(2-2)^2+(1-2)^2] / (3*6 - 14) = 12/4 = 3
    flags = {0: (1, 1, 0), 1: (1, 0, 0), 2: (1, 1, 1), 3: (0, 0, 0)}
    rows = [
        (s, t, flags[s][j])
        for s in flags
        for j, t in enumerate("abc")
    ]
    df = spark.createDataFrame(rows, "s long, t string, ok int")
    r = cochran_q(df, "s", "t", "ok").collect()[0]
    assert (r.n_subjects, r.k_treatments) == (4, 3)
    assert r.q_stat == pytest.approx(3.0, abs=1e-6)


def test_cochran_no_discordance_null(spark):
    rows = [(s, t, 1) for s in range(3) for t in "ab"]
    df = spark.createDataFrame(rows, "s long, t string, ok int")
    r = cochran_q(df, "s", "t", "ok").collect()[0]
    assert r.q_stat is None


def test_cochran_drops_incomplete_subjects(spark):
    rows = [(0, "a", 1), (0, "b", 0), (1, "a", 1)]
    df = spark.createDataFrame(rows, "s long, t string, ok int")
    r = cochran_q(df, "s", "t", "ok").collect()[0]
    assert r.n_subjects == 1


# ------------------------------------------------------------ icc_oneway


def test_icc_perfect_separation(spark):
    # zero within-group variance, nonzero between -> ICC = 1
    rows = [("a", 1.0), ("a", 1.0), ("b", 5.0), ("b", 5.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = icc_oneway(df, "g", "v").collect()[0]
    assert r.icc == pytest.approx(1.0, abs=1e-6)
    assert r.n0 == pytest.approx(2.0, abs=1e-6)


def test_icc_balanced_hand_case(spark):
    # groups {0,2} and {4,6}: grand 3; SSB = 2*(1-3)^2+2*(5-3)^2 = 16
    # SSW = 2 + 2 = 4; MSB = 16, MSW = 2, n0 = 2
    # ICC = (16-2)/(16+2) = 14/18
    rows = [("a", 0.0), ("a", 2.0), ("b", 4.0), ("b", 6.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = icc_oneway(df, "g", "v").collect()[0]
    assert r.msb == pytest.approx(16.0, abs=1e-6)
    assert r.msw == pytest.approx(2.0, abs=1e-6)
    assert r.icc == pytest.approx(14 / 18, abs=1e-6)


def test_icc_single_group_null(spark):
    rows = [("a", 1.0), ("a", 2.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = icc_oneway(df, "g", "v").collect()[0]
    assert r.icc is None and r.n0 is None


# ------------------------------------------------------------ runs_test


def test_runs_alternating_series(spark):
    # values 1,9,1,9,1,9 around median 5: signs 0,1,0,1,0,1 -> 6 runs
    rows = [("a", i, float(v)) for i, v in enumerate([1, 9, 1, 9, 1, 9])]
    df = spark.createDataFrame(rows, "g string, i long, v double")
    r = runs_test(df, "g", ["i"], "v").collect()[0]
    assert (r.n1, r.n2, r.runs) == (3, 3, 6)
    # mu = 2*9/6+1 = 4; var = 2*3*3*(18-6)/(36*5) = 1.2
    assert r.z_stat == pytest.approx(round((6 - 4.0) / (1.2**0.5), 6), abs=1e-6)


def test_runs_clustered_series(spark):
    # 1,1,1,9,9,9 -> 2 runs (maximally clustered)
    rows = [("a", i, float(v)) for i, v in enumerate([1, 1, 1, 9, 9, 9])]
    df = spark.createDataFrame(rows, "g string, i long, v double")
    r = runs_test(df, "g", ["i"], "v").collect()[0]
    assert r.runs == 2 and r.z_stat < 0


def test_runs_drops_median_equals(spark):
    # median of 1,5,9 is 5 -> the 5 row is dropped
    rows = [("a", 0, 1.0), ("a", 1, 5.0), ("a", 2, 9.0)]
    df = spark.createDataFrame(rows, "g string, i long, v double")
    r = runs_test(df, "g", ["i"], "v").collect()[0]
    assert (r.n1, r.n2) == (1, 1)
    assert r.z_stat is None  # sigma = 0 in the n1 = n2 = 1 degenerate


def test_runs_one_sided_null(spark):
    rows = [("a", 0, 1.0), ("a", 1, 1.0), ("a", 2, 9.0)]
    # median 1: above = {9}, below = {} (equals dropped) -> z NULL
    df = spark.createDataFrame(rows, "g string, i long, v double")
    r = runs_test(df, "g", ["i"], "v").collect()[0]
    assert r.z_stat is None


def test_runs_per_group_independent(spark):
    rows = [("a", i, float(v)) for i, v in enumerate([1, 9, 1, 9])] + [
        ("b", i, float(v)) for i, v in enumerate([1, 1, 9, 9])
    ]
    df = spark.createDataFrame(rows, "g string, i long, v double")
    out = {r.group: r for r in runs_test(df, "g", ["i"], "v").collect()}
    assert out["a"].runs == 4 and out["b"].runs == 2


# ------------------------------------------------------------ isotonic


def test_isotonic_already_monotone_identity(spark):
    # bin positive rates already increasing -> fitted == pos_rate
    rows = [(0.05, 0)] * 4 + [(0.55, 0), (0.55, 1)] + [(0.95, 1)] * 4
    df = spark.createDataFrame(rows, "score double, y int")
    out = {r.bin: r for r in isotonic_calibration(df, "score", "y", bins=10).collect()}
    assert out[0].fitted == pytest.approx(0.0)
    assert out[5].fitted == pytest.approx(0.5)
    assert out[9].fitted == pytest.approx(1.0)


def test_isotonic_pools_violators(spark):
    # bin rates 1.0 then 0.0 with equal weight -> pooled to 0.5
    rows = [(0.05, 1)] * 3 + [(0.95, 0)] * 3
    df = spark.createDataFrame(rows, "score double, y int")
    out = {r.bin: r for r in isotonic_calibration(df, "score", "y", bins=10).collect()}
    assert out[0].fitted == pytest.approx(0.5)
    assert out[9].fitted == pytest.approx(0.5)


def test_isotonic_weighted_pooling(spark):
    # violator pooling is WEIGHTED: rates (1.0 w=1) then (0.0 w=3)
    # pooled value = 1/4
    rows = [(0.05, 1)] + [(0.95, 0)] * 3
    df = spark.createDataFrame(rows, "score double, y int")
    out = {r.bin: r for r in isotonic_calibration(df, "score", "y", bins=10).collect()}
    assert out[0].fitted == pytest.approx(0.25)
    assert out[9].fitted == pytest.approx(0.25)


def test_isotonic_monotone_output(spark):
    rows = [
        (s / 20 + 0.01, int(i % 3 == 0))
        for i, s in enumerate(range(20))
    ]
    df = spark.createDataFrame(rows, "score double, y int")
    out = isotonic_calibration(df, "score", "y", bins=20).collect()
    fits = [r.fitted for r in sorted(out, key=lambda r: r.bin)]
    assert all(a <= b + 1e-9 for a, b in zip(fits, fits[1:]))


def test_isotonic_rejects_bad_bins(spark):
    df = spark.createDataFrame([(0.5, 1)], "score double, y int")
    with pytest.raises(ValueError):
        isotonic_calibration(df, "score", "y", bins=0)
