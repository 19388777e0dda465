"""Behavioral tests for the eleventh-batch operators: smoothed target
encoding, deterministic stratified propensity matching, B-cubed
clustering eval, Newman-Girvan modularity, the Hill tail-index
estimator, and per-key inter-arrival statistics — hand-computed
known-answer cases plus the contract edges (NULL handling, tie
direction, small-group NULLs, caliper drops) the oracle suite can't
isolate.
"""

from __future__ import annotations

import math

import pytest

from hdp_tez_spark.extensions.analytics import (
    hill_tail_index,
    interarrival_stats,
)
from hdp_tez_spark.extensions.dedup import bcubed_eval
from hdp_tez_spark.extensions.experiments import (
    propensity_match,
    target_encoding,
)
from hdp_tez_spark.extensions.graph import modularity_score


# ------------------------------------------------------------ target_encoding


def test_target_encoding_shrinks_toward_global_mean(spark):
    # cat a: n=4 mean 10; cat b: n=1 mean 0 -> global mean 8
    rows = [("a", 10.0)] * 4 + [("b", 0.0)]
    df = spark.createDataFrame(rows, "c string, y double")
    out = {r.category: r for r in target_encoding(df, "c", "y", prior_weight=1.0).collect()}
    assert out["a"].n == 4 and out["a"].raw_mean == 10.0
    # encoded_a = (4*10 + 1*8)/5 = 9.6 ; encoded_b = (1*0 + 1*8)/2 = 4.0
    assert out["a"].encoded == pytest.approx(9.6, abs=1e-6)
    assert out["b"].encoded == pytest.approx(4.0, abs=1e-6)


def test_target_encoding_null_category_and_null_target(spark):
    rows = [(None, 4.0), (None, 6.0), ("a", None), ("a", 2.0)]
    df = spark.createDataFrame(rows, "c string, y double")
    out = {r.category: r for r in target_encoding(df, "c", "y", prior_weight=0.0).collect()}
    assert out["__null__"].n == 2 and out["__null__"].raw_mean == 5.0
    assert out["a"].n == 1  # NULL target excluded from n and the mean
    assert out["a"].raw_mean == 2.0


def test_target_encoding_rejects_negative_prior(spark):
    df = spark.createDataFrame([("a", 1.0)], "c string, y double")
    with pytest.raises(ValueError):
        target_encoding(df, "c", "y", prior_weight=-1.0)


# ------------------------------------------------------------ propensity_match


def _pm_df(spark, rows):
    return spark.createDataFrame(rows, "g string, id int, t boolean, s double")


def test_propensity_match_picks_nearer_side(spark):
    df = _pm_df(spark, [
        ("x", 1, False, 1.0), ("x", 2, False, 5.0),
        ("x", 10, True, 2.0),   # prev d=1, next d=3 -> control 1
        ("x", 11, True, 4.4),   # prev d=3.4, next d=0.6 -> control 2
    ])
    out = {r.treated_id: r for r in propensity_match(df, ["g"], "id", "t", "s").collect()}
    assert out[10].control_id == 1 and out[10].score_diff == pytest.approx(1.0)
    assert out[11].control_id == 2 and out[11].score_diff == pytest.approx(0.6)


def test_propensity_match_distance_tie_prefers_predecessor(spark):
    df = _pm_df(spark, [
        ("x", 1, False, 1.0), ("x", 2, False, 5.0),
        ("x", 10, True, 3.0),  # equidistant (2.0 both sides) -> predecessor
    ])
    out = propensity_match(df, ["g"], "id", "t", "s").collect()
    assert out[0].control_id == 1


def test_propensity_match_caliper_and_empty_stratum(spark):
    df = _pm_df(spark, [
        ("x", 1, False, 1.0), ("x", 10, True, 9.0),  # diff 8 > caliper
        ("y", 20, True, 2.0),                        # stratum with no controls
    ])
    assert propensity_match(df, ["g"], "id", "t", "s", caliper=0.5).count() == 0
    # without caliper the x-stratum match survives, y still drops
    out = propensity_match(df, ["g"], "id", "t", "s").collect()
    assert [r.treated_id for r in out] == [10]


def test_propensity_match_requires_strata(spark):
    df = _pm_df(spark, [("x", 1, False, 1.0)])
    with pytest.raises(ValueError):
        propensity_match(df, [], "id", "t", "s")


# ------------------------------------------------------------ bcubed_eval


def _clusters(spark, pairs):
    return spark.createDataFrame(pairs, "id int, cluster string")


def test_bcubed_textbook_example(spark):
    # pred {1,2},{3,4,5} vs gold {1,2,3},{4,5}: P = R = 11/15
    pred = _clusters(spark, [(1, "p1"), (2, "p1"), (3, "p2"), (4, "p2"), (5, "p2")])
    gold = _clusters(spark, [(1, "g1"), (2, "g1"), (3, "g1"), (4, "g2"), (5, "g2")])
    r = bcubed_eval(pred, gold).collect()[0]
    assert r.n_items == 5
    assert r.precision == pytest.approx(11 / 15, abs=1e-6)
    assert r.recall == pytest.approx(11 / 15, abs=1e-6)
    assert r.f1 == pytest.approx(11 / 15, abs=1e-6)


def test_bcubed_perfect_and_singleton_extremes(spark):
    gold = _clusters(spark, [(i, "g") for i in range(1, 5)])
    perfect = bcubed_eval(gold, gold).collect()[0]
    assert (perfect.precision, perfect.recall, perfect.f1) == (1.0, 1.0, 1.0)
    singletons = _clusters(spark, [(i, f"s{i}") for i in range(1, 5)])
    r = bcubed_eval(singletons, gold).collect()[0]
    assert r.precision == 1.0 and r.recall == pytest.approx(0.25, abs=1e-6)


def test_bcubed_inner_join_drops_uncovered_items(spark):
    pred = _clusters(spark, [(1, "p"), (2, "p"), (99, "p")])
    gold = _clusters(spark, [(1, "g"), (2, "g"), (50, "g")])
    assert bcubed_eval(pred, gold).collect()[0].n_items == 2


# ------------------------------------------------------------ modularity_score


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "a int, b int")


def test_modularity_two_triangles_bridge(spark):
    # two triangles joined by one bridge edge; labels = triangle id.
    # m=7, per community: m_c=3, d_c=7 -> Q = 2*(3/7 - (7/14)^2)
    e = _edges(spark, [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)])
    lab = spark.createDataFrame(
        [(1, "A"), (2, "A"), (3, "A"), (4, "B"), (5, "B"), (6, "B")],
        "node int, label string",
    )
    r = modularity_score(e, lab).collect()[0]
    assert r.m_edges == 7 and r.n_communities == 2
    assert r.q == pytest.approx(2 * (3 / 7 - 0.25), abs=1e-6)


def test_modularity_single_community_is_zero(spark):
    e = _edges(spark, [(1, 2), (2, 3), (1, 3)])
    lab = spark.createDataFrame([(i, "all") for i in (1, 2, 3)], "node int, label string")
    assert modularity_score(e, lab).collect()[0].q == pytest.approx(0.0, abs=1e-6)


def test_modularity_unlabeled_nodes_become_singletons(spark):
    # no labels at all: every node its own community; two disjoint edges
    # -> Q = sum(1/2 - (2/4)^2)*0 ... each edge crosses communities:
    # m=2, m_c=0 for all four singletons, d_c=1 each -> Q = -4*(1/4)^2
    e = _edges(spark, [(1, 2), (3, 4)])
    lab = spark.createDataFrame([], "node int, label string")
    r = modularity_score(e, lab).collect()[0]
    assert r.n_communities == 4
    assert r.q == pytest.approx(-4 * (1 / 4) ** 2, abs=1e-6)


def test_modularity_dedups_and_drops_self_loops(spark):
    e = _edges(spark, [(1, 2), (2, 1), (1, 1), (1, 2)])
    lab = spark.createDataFrame([(1, "A"), (2, "A")], "node int, label string")
    r = modularity_score(e, lab).collect()[0]
    assert r.m_edges == 1 and r.q == pytest.approx(0.0, abs=1e-6)


# ------------------------------------------------------------ hill_tail_index


def test_hill_hand_computed_exponential_spacing(spark):
    # values e^3, e^2, e^1, e^0 with k=2: alpha = 2/(ln(e^3/e)+ln(e^2/e)) = 2/3
    rows = [("g", math.exp(i)) for i in (3, 2, 1, 0)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = hill_tail_index(df, ["g"], "v", k=2).collect()[0]
    assert r.n_pos == 4 and r.k_used == 2
    assert r.x_k1 == pytest.approx(math.e, abs=1e-6)
    assert r.alpha == pytest.approx(2 / 3, abs=1e-6)


def test_hill_small_group_reports_null(spark):
    df = spark.createDataFrame([("g", 5.0), ("g", 3.0)], "g string, v double")
    r = hill_tail_index(df, ["g"], "v", k=2).collect()[0]
    assert r.alpha is None and r.x_k1 is None and r.n_pos == 2


def test_hill_ignores_nonpositive_and_validates(spark):
    df = spark.createDataFrame(
        [("g", -1.0), ("g", 0.0), ("g", 2.0)], "g string, v double"
    )
    assert hill_tail_index(df, ["g"], "v", k=2).collect()[0].n_pos == 1
    with pytest.raises(ValueError):
        hill_tail_index(df, ["g"], "v", k=1)
    with pytest.raises(ValueError):
        hill_tail_index(df, [], "v", k=2)


# ------------------------------------------------------------ interarrival_stats


def test_interarrival_periodic_user_burstiness_minus_one(spark):
    rows = [(1, f"2024-01-01 00:00:{s:02d}") for s in (0, 10, 20, 30)]
    df = spark.createDataFrame(rows, "user_id int, ts string")
    r = interarrival_stats(df, ["user_id"], "ts").collect()[0]
    assert r.n_events == 4 and r.n_gaps == 3
    assert r.mean_gap_s == 10.0 and r.sd_gap_s == 0.0
    assert r.cv == 0.0 and r.burstiness == -1.0


def test_interarrival_bursty_user_and_min_events(spark):
    # gaps 1, 1, 58: mu=20, var=(1+1+3364)/3-400=722, sd=26.870058
    rows = [(1, "2024-01-01 00:00:00"), (1, "2024-01-01 00:00:01"),
            (1, "2024-01-01 00:00:02"), (1, "2024-01-01 00:01:00"),
            (2, "2024-01-01 00:00:00"), (2, "2024-01-01 00:05:00")]
    df = spark.createDataFrame(rows, "user_id int, ts string")
    out = {r.user_id: r for r in interarrival_stats(df, ["user_id"], "ts").collect()}
    assert 2 not in out  # below min_events
    r = out[1]
    sd = math.sqrt((1 + 1 + 58 * 58) / 3 - 400)
    assert r.sd_gap_s == pytest.approx(sd, abs=1e-6)
    assert r.burstiness == pytest.approx((sd - 20) / (sd + 20), abs=1e-6)


def test_interarrival_validates_args(spark):
    df = spark.createDataFrame([(1, "2024-01-01")], "user_id int, ts string")
    with pytest.raises(ValueError):
        interarrival_stats(df, ["user_id"], "ts", min_events=1)
    with pytest.raises(ValueError):
        interarrival_stats(df, [], "ts")
