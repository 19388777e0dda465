"""Behavioral tests for the ninth-batch operators: split conformal
intervals, the streaming SPRT monitor, quantile normalization, exact
trimmed means, blocking-quality evaluation, and lift/gains curves —
known-answer cases the oracle suite can't reach (finite-sample k
arithmetic incl. the infinite-interval edge, streaming/batch parity on
the same rows, the textbook Bolstad normalization example, outlier
immunity, direction/duplicate normalization of pair sets, and tied-
score bucket straddles).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hdp_tez_spark.extensions.analytics import (
    lift_curve,
    quantile_normalize,
    trimmed_mean,
)
from hdp_tez_spark.extensions.dedup import blocking_eval
from hdp_tez_spark.extensions.experiments import conformal_intervals, sprt_check


# ------------------------------------------------------------ conformal


def _resid_df(spark, rs, extra_cols=()):
    rows = [("g", float(r), 0.0) for r in rs]
    return spark.createDataFrame(rows, "g string, y double, yhat double")


def test_conformal_finite_sample_k_and_coverage(spark):
    # cal residuals 1..10, alpha=0.1: k = ceil(11*0.9) = 10 -> qhat = 10
    cal = _resid_df(spark, range(1, 11))
    test = _resid_df(spark, [5.0, 10.0, 11.0])
    r = conformal_intervals(cal, test, ["g"], "y", "yhat", alpha=0.1).collect()[0]
    assert (r.n_cal, r.qhat) == (10, 10.0)
    assert (r.n_test, r.covered) == (3, 2)  # 5 and 10 inside, 11 out
    assert r.coverage == pytest.approx(2 / 3, abs=1e-6)


def test_conformal_mid_alpha_picks_interior_order_statistic(spark):
    # alpha=0.5: k = ceil(11*0.5) = 6 -> qhat = 6th smallest
    cal = _resid_df(spark, range(1, 11))
    test = _resid_df(spark, [6.0, 6.5])
    r = conformal_intervals(cal, test, ["g"], "y", "yhat", alpha=0.5).collect()[0]
    assert r.qhat == 6.0
    assert r.covered == 1


def test_conformal_infinite_interval_when_k_exceeds_n(spark):
    # n_cal=3, alpha=0.1: k = ceil(4*0.9) = 4 > 3 -> infinite interval
    cal = _resid_df(spark, [1.0, 2.0, 3.0])
    test = _resid_df(spark, [100.0, 200.0])
    r = conformal_intervals(cal, test, ["g"], "y", "yhat", alpha=0.1).collect()[0]
    assert r.qhat is None
    assert (r.covered, r.coverage) == (2, 1.0)


# ------------------------------------------------------------ stream_sprt


def test_sprt_monitor_final_state_equals_batch(spark, tmp_path):
    import uuid

    from hdp_tez_spark.streaming.monitors import sprt_monitor

    rows = [("a", i % 3 == 0) for i in range(40)] + [
        ("b", i % 2 == 0) for i in range(30)
    ]
    df = spark.createDataFrame(rows, "g string, succ boolean")
    src = str(tmp_path / "sprt_src")
    df.coalesce(1).write.mode("overwrite").parquet(src)
    sdf = spark.readStream.schema("g string, succ boolean").parquet(src)
    res = sprt_monitor(sdf, ["g"], "succ", p0=0.4, p1=0.6)
    qname = f"tsprt_{uuid.uuid4().hex[:8]}"
    q = (
        res.writeStream.outputMode("update")
        .format("memory")
        .queryName(qname)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r.g: (r.n, r.successes, r.llr, r.decision)
        for r in spark.table(qname).collect()
    }
    want = {
        r.g: (r.n, r.successes, r.llr, r.decision)
        for r in sprt_check(df, ["g"], "succ", p0=0.4, p1=0.6).collect()
    }
    assert got == want


# ------------------------------------------------------------ quantile_normalize


def test_quantile_normalize_bolstad_textbook(spark):
    # Bolstad et al. '03 example: columns A=[5,2,3], B=[4,1,4], C=[3,4,6]
    # rank means: (2+1+3)/3=2, (3+4+4)/3, (5+4+6)/3=5
    rows = (
        [("A", 1, 5.0), ("A", 2, 2.0), ("A", 3, 3.0)]
        + [("B", 1, 4.0), ("B", 2, 1.0), ("B", 3, 4.0)]
        + [("C", 1, 3.0), ("C", 2, 4.0), ("C", 3, 6.0)]
    )
    df = spark.createDataFrame(rows, "g string, id int, v double")
    out = {(r.g, r.id): r.qnorm for r in quantile_normalize(df, ["g"], "id", "v").collect()}
    mid = (3 + 4 + 4) / 3
    assert out[("A", 2)] == pytest.approx(2.0, abs=1e-6)      # A's smallest
    assert out[("A", 3)] == pytest.approx(mid, abs=1e-6)      # A's middle
    assert out[("A", 1)] == pytest.approx(5.0, abs=1e-6)      # A's largest
    assert out[("B", 2)] == pytest.approx(2.0, abs=1e-6)
    # B's tie (4, 4) resolves by id: id=1 before id=3
    assert out[("B", 1)] == pytest.approx(mid, abs=1e-6)
    assert out[("B", 3)] == pytest.approx(5.0, abs=1e-6)
    assert out[("C", 1)] == pytest.approx(2.0, abs=1e-6)


def test_quantile_normalize_is_monotone_within_group(spark):
    rows = [("g1", i, float(x)) for i, x in enumerate([9, 1, 5, 7, 3])] + [
        ("g2", i, float(x)) for i, x in enumerate([100, 2, 50, 75, 10])
    ]
    df = spark.createDataFrame(rows, "g string, id int, v double")
    out = quantile_normalize(df, ["g"], "id", "v").collect()
    for g in ("g1", "g2"):
        pairs = sorted(
            [(r.value, r.qnorm) for r in out if r.g == g]
        )
        qs = [q for _, q in pairs]
        assert qs == sorted(qs)  # order preserved
    # identical distributions after normalization
    g1 = sorted(r.qnorm for r in out if r.g == "g1")
    g2 = sorted(r.qnorm for r in out if r.g == "g2")
    assert g1 == pytest.approx(g2, abs=1e-6)


# ------------------------------------------------------------ trimmed_mean


def test_trimmed_mean_ignores_planted_outliers(spark):
    vals = [-1000.0] + [float(v) for v in range(1, 9)] + [1000.0]
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v double")
    r = trimmed_mean(df, ["g"], "v", trim=0.1).collect()[0]
    assert (r.n, r.n_trimmed_each_side) == (10, 1)
    assert r.trimmed_mean == pytest.approx(4.5, abs=1e-6)  # mean(1..8)


def test_trimmed_mean_zero_trim_is_plain_mean(spark):
    df = spark.createDataFrame(
        [("g", float(v)) for v in (1, 2, 9)], "g string, v double"
    )
    r = trimmed_mean(df, ["g"], "v", trim=0.0).collect()[0]
    assert r.trimmed_mean == pytest.approx(4.0, abs=1e-6)
    with pytest.raises(ValueError):
        trimmed_mean(df, ["g"], "v", trim=0.5)


def test_trimmed_mean_always_keeps_at_least_one_row(spark):
    df = spark.createDataFrame(
        [("g", float(v)) for v in (1, 2, 3, 4, 5)], "g string, v double"
    )
    r = trimmed_mean(df, ["g"], "v", trim=0.4).collect()[0]
    assert (r.n, r.n_trimmed_each_side) == (5, 2)
    assert r.trimmed_mean == pytest.approx(3.0, abs=1e-6)  # the median row


# ------------------------------------------------------------ blocking_eval


def test_blocking_eval_hand_computed(spark):
    cand = spark.createDataFrame(
        [(1, 2), (2, 3)], "id_a long, id_b long"
    )
    truth = spark.createDataFrame(
        [(1, 2), (3, 4)], "id_a long, id_b long"
    )
    r = blocking_eval(cand, truth, n_entities=4).collect()[0]
    assert (r.n_candidates, r.n_truth, r.n_matched) == (2, 2, 1)
    assert r.pair_completeness == pytest.approx(0.5, abs=1e-6)
    assert r.reduction_ratio == pytest.approx(1 - 2 / 6, abs=1e-6)


def test_blocking_eval_normalizes_direction_and_duplicates(spark):
    # (2,1) and (1,2) are the same pair; self-pairs are dropped
    cand = spark.createDataFrame(
        [(2, 1), (1, 2), (1, 1), (3, 2)], "id_a long, id_b long"
    )
    truth = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    r = blocking_eval(cand, truth, n_entities=3).collect()[0]
    assert (r.n_candidates, r.n_matched) == (2, 1)
    assert r.pair_completeness == pytest.approx(1.0, abs=1e-6)
    assert r.reduction_ratio == pytest.approx(1 - 2 / 3, abs=1e-6)


def test_blocking_eval_empty_truth_reports_null_completeness(spark):
    cand = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    truth = spark.createDataFrame([], "id_a long, id_b long")
    r = blocking_eval(cand, truth, n_entities=5).collect()[0]
    assert r.n_truth == 0
    assert r.pair_completeness is None  # undefined, not silently 1 or 0


# ------------------------------------------------------------ lift_curve


def test_lift_curve_perfect_separation_front_loads_capture(spark):
    # 10 distinct scores, the top 2 are the positives, 5 buckets
    df = spark.createDataFrame(
        [(float(10 - i), 1 if i < 2 else 0) for i in range(10)],
        "score double, label int",
    )
    out = {r.bucket: r for r in lift_curve(df, "score", "label", n_buckets=5).collect()}
    assert len(out) == 5
    assert out[1].n == 2 and out[1].n_pos == pytest.approx(2.0, abs=1e-9)
    assert out[1].capture_rate == pytest.approx(1.0, abs=1e-6)
    assert out[1].lift == pytest.approx(5.0, abs=1e-6)  # (2/2)/(2/10)
    assert out[5].capture_rate == pytest.approx(1.0, abs=1e-6)
    assert out[5].lift == pytest.approx(1.0, abs=1e-6)  # full set = base rate


def test_lift_curve_all_tied_scores_split_proportionally(spark):
    # one score cell straddling every bucket: positives attribute
    # proportionally, lift is exactly 1 everywhere
    df = spark.createDataFrame(
        [(1.0, 1 if i < 2 else 0) for i in range(10)],
        "score double, label int",
    )
    out = lift_curve(df, "score", "label", n_buckets=5).collect()
    assert len(out) == 5
    for r in out:
        assert r.n == 2
        assert r.n_pos == pytest.approx(0.4, abs=1e-6)
        assert r.lift == pytest.approx(1.0, abs=1e-6)


def test_lift_curve_counts_are_exact_partitions(spark):
    # bucket row counts must partition n exactly even when n % buckets != 0
    df = spark.createDataFrame(
        [(float(i), i % 2) for i in range(13)], "score double, label int"
    )
    out = lift_curve(df, "score", "label", n_buckets=5).collect()
    assert sum(r.n for r in out) == 13
    assert out[-1].cum_n == 13
    assert out[-1].capture_rate == pytest.approx(1.0, abs=1e-6)
