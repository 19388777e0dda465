"""Behavioral tests for the seventh-batch operators: Nelson-Aalen
cumulative hazard, Theil-Sen robust trend, binary ranking eval
(P@k/R@k/AP@k/RR@k), asymmetric shingle containment, embedding
outlier screening, and the character-class mix audit — known-answer
cases the oracle suite can't reach (textbook hazard increments,
outlier-immunity of the pairwise-slope median, hand-computed IR
metrics, directed quote-inclusion pairs, zero-variance corpora,
unicode / empty / NULL text edges).
"""

from __future__ import annotations

import pytest

from hdp_tez_spark.extensions.analytics import nelson_aalen, theil_sen_trend
from hdp_tez_spark.extensions.dedup import containment_pairs
from hdp_tez_spark.extensions.ranking import ranking_eval
from hdp_tez_spark.extensions.similarity import embedding_outliers
from hdp_tez_spark.extensions.textstats import charclass_mix


# ------------------------------------------------------------ nelson_aalen


def test_nelson_aalen_textbook_hazard_increments(spark):
    # events at t=1 (1 of 6), t=3 (2 of 4 after a censor at 2),
    # t=5 (1 of 1 after a censor at 4):
    # H = 1/6, 1/6 + 2/4, then + 1/1; Var = 1/36, + 2/16, + 1/1
    rows = [(1, 1), (2, 0), (3, 1), (3, 1), (4, 0), (5, 1)]
    df = spark.createDataFrame(
        [("g", t, e) for t, e in rows], "g string, t int, ev int"
    )
    out = {r.t: r for r in nelson_aalen(df, ["g"], "t", "ev").collect()}
    assert set(out) == {1, 3, 5}  # censor-only times emit no row
    assert (out[1].n_risk, out[1].n_event, out[1].n_censored) == (6, 1, 0)
    assert out[1].cum_hazard == pytest.approx(1 / 6, abs=1e-6)
    assert out[3].cum_hazard == pytest.approx(1 / 6 + 2 / 4, abs=1e-6)
    assert out[3].var_hazard == pytest.approx(1 / 36 + 2 / 16, abs=1e-6)
    # additive where KM multiplies: the exhausted risk set adds a full
    # unit of hazard instead of zeroing the curve
    assert out[5].cum_hazard == pytest.approx(1 / 6 + 2 / 4 + 1, abs=1e-6)
    assert out[5].var_hazard == pytest.approx(1 / 36 + 2 / 16 + 1, abs=1e-6)


def test_nelson_aalen_all_censored_group_is_empty(spark):
    df = spark.createDataFrame(
        [("g", 3, 0), ("g", 5, 0)], "g string, t int, ev int"
    )
    assert nelson_aalen(df, ["g"], "t", "ev").count() == 0


def test_nelson_aalen_tracks_km_risk_sets(spark):
    # same subjects as the KM textbook test: risk-set accounting must
    # be identical between the two estimators (shared machinery)
    from hdp_tez_spark.extensions.analytics import kaplan_meier

    df = spark.createDataFrame(
        [("a", 1, 1), ("a", 1, 0), ("a", 2, 1), ("a", 3, 0), ("a", 3, 1)],
        "g string, t int, ev int",
    )
    na = {r.t: r for r in nelson_aalen(df, ["g"], "t", "ev").collect()}
    km = {r.t: r for r in kaplan_meier(df, ["g"], "t", "ev").collect()}
    assert set(na) == set(km)
    for t in na:
        assert (na[t].n_risk, na[t].n_event, na[t].n_censored) == (
            km[t].n_risk,
            km[t].n_event,
            km[t].n_censored,
        )


# ------------------------------------------------------------ theil_sen


def test_theil_sen_ignores_outlier_that_bends_ols(spark):
    # y = 2x + 1 with one wild outlier at x=2; the pairwise-slope
    # median stays exactly 2 / intercept 1, where OLS would not
    rows = [(0, 1.0), (1, 3.0), (2, 100.0), (3, 7.0), (4, 9.0)]
    df = spark.createDataFrame(
        [("g", x, y) for x, y in rows], "g string, x int, y double"
    )
    out = theil_sen_trend(df, ["g"], "x", "y").collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_points, r.n_pairs) == (5, 10)
    assert r.slope == pytest.approx(2.0, abs=1e-6)
    assert r.intercept == pytest.approx(1.0, abs=1e-6)


def test_theil_sen_exact_line_recovered_per_group(spark):
    rows = [("a", x, 3.0 * x - 2.0) for x in range(6)] + [
        ("b", x, -0.5 * x + 4.0) for x in range(4)
    ]
    df = spark.createDataFrame(rows, "g string, x int, y double")
    out = {r.g: r for r in theil_sen_trend(df, ["g"], "x", "y").collect()}
    assert out["a"].slope == pytest.approx(3.0, abs=1e-6)
    assert out["a"].intercept == pytest.approx(-2.0, abs=1e-6)
    assert out["b"].slope == pytest.approx(-0.5, abs=1e-6)
    assert out["b"].intercept == pytest.approx(4.0, abs=1e-6)


def test_theil_sen_duplicate_x_collapses_to_mean_and_single_point_drops(spark):
    # two readings at x=1 average to y=3; the single-point group has no
    # pairs and emits no row (a slope needs two distinct x)
    df = spark.createDataFrame(
        [("g", 0, 1.0), ("g", 1, 2.0), ("g", 1, 4.0), ("lone", 5, 9.0)],
        "g string, x int, y double",
    )
    out = {r.g: r for r in theil_sen_trend(df, ["g"], "x", "y").collect()}
    assert set(out) == {"g"}
    assert out["g"].n_points == 2
    assert out["g"].slope == pytest.approx(2.0, abs=1e-6)


# ------------------------------------------------------------ ranking_eval


def test_ranking_eval_hand_computed_metrics(spark):
    # top-5 run, relevant = {d2 (pos 2), d4 (pos 4), d9 (unranked)}:
    # hits=2, P@5=0.4, R@5=2/3, AP@5=(1/2 + 2/4)/min(3,5)=1/3, RR=1/2
    ranked = spark.createDataFrame(
        [("q", f"d{i}", 6.0 - i, i) for i in range(1, 6)],
        "q string, doc string, score double, rn int",
    )
    labels = spark.createDataFrame(
        [("q", "d2", 1), ("q", "d4", 1), ("q", "d9", 1)],
        "q string, doc string, rel int",
    )
    r = ranking_eval(
        ranked, labels, "q", "doc", "rel", rank_col="rn", k=5
    ).collect()[0]
    assert (r.n_rel, r.hits_at_k) == (3, 2)
    assert r.p_at_k == pytest.approx(0.4, abs=1e-6)
    assert r.r_at_k == pytest.approx(2 / 3, abs=1e-6)
    assert r.ap_at_k == pytest.approx(1 / 3, abs=1e-6)
    assert r.rr_at_k == pytest.approx(0.5, abs=1e-6)


def test_ranking_eval_perfect_and_empty_queries(spark):
    ranked = spark.createDataFrame(
        [("hit", "a", 2.0, 1), ("hit", "b", 1.0, 2)]
        + [("miss", "a", 2.0, 1), ("miss", "b", 1.0, 2)],
        "q string, doc string, score double, rn int",
    )
    labels = spark.createDataFrame(
        [("hit", "a", 1), ("hit", "b", 1)], "q string, doc string, rel int"
    )
    out = {
        r.q: r
        for r in ranking_eval(
            ranked, labels, "q", "doc", "rel", rank_col="rn", k=2
        ).collect()
    }
    assert out["hit"].ap_at_k == pytest.approx(1.0, abs=1e-6)
    assert out["hit"].rr_at_k == pytest.approx(1.0, abs=1e-6)
    assert out["hit"].r_at_k == pytest.approx(1.0, abs=1e-6)
    # no judged positives: recall/AP are NULL (undefined), RR reports 0
    assert out["miss"].n_rel == 0
    assert out["miss"].r_at_k is None
    assert out["miss"].ap_at_k is None
    assert out["miss"].rr_at_k == pytest.approx(0.0, abs=1e-9)


def test_ranking_eval_score_ordering_when_no_rank_col(spark):
    # without rank_col positions come from (score DESC, id ASC); the
    # relevant doc at the top scores RR=1 even though insertion order
    # put it last
    ranked = spark.createDataFrame(
        [("q", "z_low", 1.0), ("q", "a_top", 9.0)],
        "q string, doc string, score double",
    )
    labels = spark.createDataFrame(
        [("q", "a_top", 1)], "q string, doc string, rel int"
    )
    r = ranking_eval(ranked, labels, "q", "doc", "rel", k=2).collect()[0]
    assert r.rr_at_k == pytest.approx(1.0, abs=1e-6)


# ------------------------------------------------------------ containment


def test_containment_detects_quote_inclusion_jaccard_misses(spark):
    short = "alpha beta gamma delta epsilon"
    long_ = (
        "intro words here " + short + " and then a very long tail "
        "continues with many more unrelated tokens stretching onward "
        "far beyond the quoted span to dilute any jaccard overlap"
    )
    df = spark.createDataFrame(
        [(1, short), (2, long_)], "doc_id long, text string"
    )
    out = {
        (r.src_id, r.dst_id): r
        for r in containment_pairs(
            df, "doc_id", "text", k=3, threshold=0.5
        ).collect()
    }
    # every shingle of the short doc appears verbatim in the long one
    assert out[(1, 2)].containment == pytest.approx(1.0, abs=1e-6)
    # the long doc is NOT contained in the short one at this threshold
    assert (2, 1) not in out


def test_containment_is_directional_and_bounded(spark):
    df = spark.createDataFrame(
        [
            (1, "one two three four five"),
            (2, "one two three four five six seven eight nine ten"),
        ],
        "doc_id long, text string",
    )
    rows = containment_pairs(df, "doc_id", "text", k=3, threshold=0.0).collect()
    by_dir = {(r.src_id, r.dst_id): r for r in rows}
    assert by_dir[(1, 2)].containment == pytest.approx(1.0, abs=1e-6)
    # 3 of the 8 shingles of doc 2 fall inside doc 1
    assert by_dir[(2, 1)].containment == pytest.approx(3 / 8, abs=1e-6)
    for r in rows:
        assert 0.0 <= r.containment <= 1.0
        assert r.n_inter <= r.src_size


def test_containment_no_shared_shingles_no_rows(spark):
    df = spark.createDataFrame(
        [(1, "aa bb cc dd"), (2, "ww xx yy zz")], "doc_id long, text string"
    )
    assert (
        containment_pairs(df, "doc_id", "text", k=3, threshold=0.0).count() == 0
    )


# ------------------------------------------------------------ embedding_outliers


def test_embedding_outliers_flags_the_far_vector(spark):
    base = [[1.0, 0.0, 5.0], [1.1, 0.1, 5.0], [0.9, -0.1, 5.0], [1.0, 0.0, 5.0]]
    far = [[50.0, 30.0, 5.0]]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(base + far)],
        "vec_id long, embedding array<double>",
    )
    out = embedding_outliers(df, "vec_id", "embedding", top_n=5).collect()
    assert out[0].vec_id == 4  # the planted outlier ranks first
    assert out[0].score > out[1].score
    # dim 2 is constant (sigma = 0): contributes 0, never NaN/NULL
    assert all(r.score is not None and r.score >= 0.0 for r in out)


def test_embedding_outliers_identical_corpus_scores_zero(spark):
    df = spark.createDataFrame(
        [(i, [2.0, 3.0]) for i in range(4)],
        "vec_id long, embedding array<double>",
    )
    out = embedding_outliers(df, "vec_id", "embedding", top_n=10).collect()
    assert len(out) == 4
    assert all(r.score == pytest.approx(0.0, abs=1e-9) for r in out)
    # deterministic tie-break by id when every score ties
    assert [r.vec_id for r in out] == [0, 1, 2, 3]


def test_embedding_outliers_two_point_symmetry(spark):
    # two vectors are each 1 population-sd from the shared mean in
    # every varying dimension: both score exactly 1
    df = spark.createDataFrame(
        [(0, [0.0, 10.0]), (1, [2.0, 12.0])],
        "vec_id long, embedding array<double>",
    )
    out = embedding_outliers(df, "vec_id", "embedding", top_n=2).collect()
    assert [r.score for r in out] == [pytest.approx(1.0, abs=1e-6)] * 2


# ------------------------------------------------------------ charclass_mix


def test_charclass_mix_hand_counted_ratios(spark):
    df = spark.createDataFrame([(1, "ab1 ?")], "doc_id long, text string")
    r = charclass_mix(df, "doc_id", "text").collect()[0]
    assert r.n_chars == 5
    assert r.letter_ratio == pytest.approx(2 / 5, abs=1e-6)
    assert r.digit_ratio == pytest.approx(1 / 5, abs=1e-6)
    assert r.space_ratio == pytest.approx(1 / 5, abs=1e-6)
    assert r.symbol_ratio == pytest.approx(1 / 5, abs=1e-6)
    assert r.non_ascii_ratio == pytest.approx(0.0, abs=1e-9)


def test_charclass_mix_non_ascii_not_double_counted(spark):
    # é is non-ASCII, NOT a [A-Za-z] letter and NOT a symbol; the five
    # ratios must still sum to 1
    df = spark.createDataFrame([(1, "héllo")], "doc_id long, text string")
    r = charclass_mix(df, "doc_id", "text").collect()[0]
    assert r.n_chars == 5
    assert r.letter_ratio == pytest.approx(4 / 5, abs=1e-6)
    assert r.non_ascii_ratio == pytest.approx(1 / 5, abs=1e-6)
    total = (
        r.letter_ratio
        + r.digit_ratio
        + r.space_ratio
        + r.symbol_ratio
        + r.non_ascii_ratio
    )
    assert total == pytest.approx(1.0, abs=1e-5)


def test_charclass_mix_empty_and_null_text_report_zeros(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, None)], "doc_id long, text string"
    )
    for r in charclass_mix(df, "doc_id", "text").collect():
        assert r.n_chars == 0
        assert r.letter_ratio == 0.0
        assert r.digit_ratio == 0.0
        assert r.space_ratio == 0.0
        assert r.symbol_ratio == 0.0
        assert r.non_ascii_ratio == 0.0
