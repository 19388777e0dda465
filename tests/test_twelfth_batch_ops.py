"""Behavioral tests for the twelfth-batch operators: RFM scoring,
rare-category truncation, sorted-neighborhood blocking, average
precision, k-NN majority labeling, and the time-embargo split —
known-answer cases the oracle suite can't reach (hand-computed band
edges and AP sums, tie-break contracts, the linear candidate budget,
embargo boundary semantics, and input-validation errors).
"""

from __future__ import annotations

import datetime as dt

import pytest

from hdp_tez_spark.extensions.analytics import rfm_scores
from hdp_tez_spark.extensions.curation import group_rare_categories
from hdp_tez_spark.extensions.dedup import sorted_neighborhood_pairs
from hdp_tez_spark.extensions.experiments import average_precision
from hdp_tez_spark.extensions.similarity import knn_label
from hdp_tez_spark.extensions.splits import time_embargo_split


# ------------------------------------------------------------ rfm_scores


def _order_rows():
    # 5 customers, strictly ordered on all three dimensions so every
    # band is a hand-computable singleton at buckets=5:
    # cust k: last day = Jan (k+1), k+1 orders of 10.0*(k+1) each.
    rows = []
    for k in range(5):
        for j in range(k + 1):
            rows.append((k, dt.datetime(2024, 1, k + 1, 12, 0, 0), 10.0 * (k + 1)))
    return rows


def test_rfm_scores_singleton_bands(spark):
    df = spark.createDataFrame(
        _order_rows(), "cust long, ts timestamp, amount double"
    )
    out = {r.key: r for r in rfm_scores(df, "cust", "ts", "amount", buckets=5).collect()}
    assert len(out) == 5
    for k in range(5):
        r = out[k]
        # all three dimensions rank customer k at position k+1 of 5
        assert (r.r_score, r.f_score, r.m_score) == (k + 1, k + 1, k + 1)
        assert r.rfm == 100 * (k + 1) + 10 * (k + 1) + (k + 1)
        assert r.frequency == k + 1
        assert r.monetary == pytest.approx(10.0 * (k + 1) * (k + 1))
        assert r.last_ts == dt.datetime(2024, 1, k + 1, 12, 0, 0)


def test_rfm_scores_null_ts_rows_excluded(spark):
    rows = _order_rows() + [(9, None, 999.0)]
    df = spark.createDataFrame(rows, "cust long, ts timestamp, amount double")
    keys = {r.key for r in rfm_scores(df, "cust", "ts", "amount").collect()}
    assert 9 not in keys


def test_rfm_scores_bucket_validation(spark):
    df = spark.createDataFrame(_order_rows(), "cust long, ts timestamp, amount double")
    with pytest.raises(ValueError):
        rfm_scores(df, "cust", "ts", "amount", buckets=1)
    with pytest.raises(ValueError):
        rfm_scores(df, "cust", "ts", "amount", buckets=10)


# ------------------------------------------------------------ group_rare_categories


def test_group_rare_categories_maps_tail_and_null(spark):
    rows = [("a",)] * 5 + [("b",)] * 2 + [(None,)] * 3
    df = spark.createDataFrame(rows, "cat string")
    out = {r.category: r for r in group_rare_categories(df, "cat", min_count=3).collect()}
    assert out["a"].mapped == "a" and out["a"].kept
    assert out["b"].mapped == "__other__" and not out["b"].kept
    # NULL is a real category, counted like any other
    assert out["__null__"].n == 3 and out["__null__"].mapped == "__null__"


def test_group_rare_categories_min_count_validation(spark):
    df = spark.createDataFrame([("a",)], "cat string")
    with pytest.raises(ValueError):
        group_rare_categories(df, "cat", min_count=0)


# ------------------------------------------------------------ sorted_neighborhood_pairs


def test_sorted_neighborhood_hand_case(spark):
    # key-sorted order (ties by id): (3,'a') (1,'b') (4,'b') (2,'c')
    df = spark.createDataFrame(
        [(1, "b"), (2, "c"), (3, "a"), (4, "b")], "id long, key string"
    )
    out = sorted_neighborhood_pairs(df, "id", "key", window=2).collect()
    pairs = {(r.id_a, r.id_b): r.rank_gap for r in out}
    assert pairs == {
        (3, 1): 1, (3, 4): 2,   # 'a' pairs with the next two
        (1, 4): 1, (1, 2): 2,   # first 'b' with second 'b' and 'c'
        (4, 2): 1,              # second 'b' with 'c'
    }


def test_sorted_neighborhood_linear_budget(spark):
    n, w = 50, 4
    df = spark.createDataFrame([(i, "same") for i in range(n)], "id long, key string")
    out = sorted_neighborhood_pairs(df, "id", "key", window=w).collect()
    # every record pairs with at most w successors: exact count for a
    # single block is n*w - w*(w+1)/2; never more than w*n
    assert len(out) == n * w - w * (w + 1) // 2
    # ties sort by id, so neighbors are id-adjacent in rank
    gaps = {(r.id_a, r.id_b) for r in out if r.rank_gap == 1}
    assert gaps == {(i, i + 1) for i in range(n - 1)}


def test_sorted_neighborhood_window_validation(spark):
    df = spark.createDataFrame([(1, "a")], "id long, key string")
    with pytest.raises(ValueError):
        sorted_neighborhood_pairs(df, "id", "key", window=0)


# ------------------------------------------------------------ average_precision


def test_average_precision_textbook_case(spark):
    # ranked by score desc: labels 1,0,1,0,1 -> AP = (1/1 + 2/3 + 3/5)/3
    rows = [("g", 5.0, 1, 1), ("g", 4.0, 2, 0), ("g", 3.0, 3, 1),
            ("g", 2.0, 4, 0), ("g", 1.0, 5, 1)]
    df = spark.createDataFrame(rows, "grp string, score double, id long, label int")
    r = average_precision(df, ["grp"], "score", "label", "id").collect()[0]
    assert (r.n, r.n_pos) == (5, 3)
    assert r.ap == pytest.approx((1.0 + 2.0 / 3.0 + 3.0 / 5.0) / 3.0, abs=1e-6)


def test_average_precision_no_positives_is_null(spark):
    df = spark.createDataFrame(
        [("g", 2.0, 1, 0), ("g", 1.0, 2, 0)],
        "grp string, score double, id long, label int",
    )
    r = average_precision(df, ["grp"], "score", "label", "id").collect()[0]
    assert r.n_pos == 0 and r.ap is None


def test_average_precision_tie_break_by_id(spark):
    # equal scores: rank order pinned by id asc -> labels 0 then 1
    df = spark.createDataFrame(
        [("g", 1.0, 1, 0), ("g", 1.0, 2, 1)],
        "grp string, score double, id long, label int",
    )
    r = average_precision(df, ["grp"], "score", "label", "id").collect()[0]
    assert r.ap == pytest.approx(0.5, abs=1e-6)  # positive at rank 2


def test_average_precision_requires_groups(spark):
    df = spark.createDataFrame([("g", 1.0, 1, 1)], "grp string, score double, id long, label int")
    with pytest.raises(ValueError):
        average_precision(df, [], "score", "label", "id")


# ------------------------------------------------------------ knn_label


def test_knn_label_majority_and_tie_break(spark):
    # axis-aligned train vectors: 2 near +x labeled 1, 1 near +y labeled 2
    train = spark.createDataFrame(
        [
            (10, [1.0, 0.0], 1),
            (11, [0.9, 0.1], 1),
            (12, [0.0, 1.0], 2),
        ],
        "vec_id long, embedding array<double>, label int",
    )
    q = spark.createDataFrame(
        [(1, [1.0, 0.05], 0)], "vec_id long, embedding array<double>, label int"
    )
    r = knn_label(q, train, k=3).collect()[0]
    assert (r.query_id, r.label, r.votes, r.k_used) == (1, 1, 2, 3)

    # k=2: nearest two are both label 1
    r2 = knn_label(q, train, k=2).collect()[0]
    assert (r2.label, r2.votes, r2.k_used) == (1, 2, 2)


def test_knn_label_tie_goes_to_smallest_label(spark):
    # one neighbor of each label equidistant-ish: votes tie 1-1 -> label min
    train = spark.createDataFrame(
        [(10, [1.0, 0.0], 7), (11, [0.0, 1.0], 3)],
        "vec_id long, embedding array<double>, label int",
    )
    q = spark.createDataFrame(
        [(1, [1.0, 1.0], 0)], "vec_id long, embedding array<double>, label int"
    )
    r = knn_label(q, train, k=2).collect()[0]
    assert r.label == 3 and r.votes == 1


def test_knn_label_k_validation(spark):
    df = spark.createDataFrame(
        [(1, [1.0], 0)], "vec_id long, embedding array<double>, label int"
    )
    with pytest.raises(ValueError):
        knn_label(df, df, k=0)


# ------------------------------------------------------------ time_embargo_split


def test_time_embargo_split_hand_case(spark):
    # 10 rows at seconds 0..9, train_frac=0.8 -> cutoff at t=7 (cum 8),
    # embargo_seconds=2 -> t in (7, 9] embargo, rest test
    base = dt.datetime(2024, 1, 1)
    rows = [(i, base + dt.timedelta(seconds=i)) for i in range(10)]
    df = spark.createDataFrame(rows, "id long, ts timestamp")
    out = {r.id: r.split for r in time_embargo_split(df, "id", "ts", 0.8, 2).collect()}
    assert [out[i] for i in range(10)] == ["train"] * 8 + ["embargo", "embargo"]


def test_time_embargo_split_tie_mass_into_train(spark):
    # 4 rows share the cutoff second: all land train even though the
    # achieved fraction (6/8) exceeds train_frac=0.5
    base = dt.datetime(2024, 1, 1)
    rows = [(i, base) for i in range(2)] + [
        (10 + i, base + dt.timedelta(seconds=5)) for i in range(4)
    ] + [(20, base + dt.timedelta(seconds=50000)), (21, base + dt.timedelta(seconds=50001))]
    df = spark.createDataFrame(rows, "id long, ts timestamp")
    out = {r.id: r.split for r in time_embargo_split(df, "id", "ts", 0.5, 3600).collect()}
    assert all(out[i] == "train" for i in [0, 1, 10, 11, 12, 13])
    assert out[20] == "test" and out[21] == "test"


def test_time_embargo_split_zero_embargo_and_validation(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [(i, base + dt.timedelta(seconds=i)) for i in range(4)]
    df = spark.createDataFrame(rows, "id long, ts timestamp")
    out = {r.id: r.split for r in time_embargo_split(df, "id", "ts", 0.5, 0).collect()}
    assert list(out.values()).count("embargo") == 0
    assert out[3] == "test"
    with pytest.raises(ValueError):
        time_embargo_split(df, "id", "ts", 1.5, 0)
    with pytest.raises(ValueError):
        time_embargo_split(df, "id", "ts", 0.5, -1)
