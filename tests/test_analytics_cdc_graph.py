"""Behavioral tests for extensions.analytics / cdc / graph and the
prefix_sum primitive — edge cases the oracle-paired registry queries
don't exercise (degenerate MAD, boundary probs, latest-wins ties,
analytic PageRank fixpoints)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from hdp_tez_spark.extensions.analytics import exact_quantiles, robust_outliers
from hdp_tez_spark.extensions.cdc import merge_upsert, scd2_build
from hdp_tez_spark.extensions.graph import pagerank
from hdp_tez_spark.operators.sort import prefix_sum
from hdp_tez_spark.sources.catalog import load_table
from tests.conftest import SF_SMOKE


# ---------------------------------------------------------------- prefix_sum


def test_prefix_sum_matches_sequential(spark):
    rows = [(i, float((i * 7) % 13 + 1)) for i in range(1, 201)]
    df = spark.createDataFrame(rows, "k int, v double").repartition(8)
    out = {
        r["k"]: r["cumsum"]
        for r in prefix_sum(df, [F.col("k")], "v", "cumsum").collect()
    }
    running = 0.0
    for k, v in rows:
        running += v
        assert out[k] == pytest.approx(running)


# ----------------------------------------------------------- exact_quantiles


def test_exact_quantiles_boundaries_and_interpolation(spark):
    vals = [1.0, 2.0, 3.0, 4.0, 10.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = {r["p"]: r["q"] for r in exact_quantiles(df, "x", [0.0, 0.5, 0.75, 1.0]).collect()}
    assert got[0.0] == 1.0  # min
    assert got[1.0] == 10.0  # max
    assert got[0.5] == 3.0  # exact middle order statistic
    # t = 1 + 0.75*4 = 4 -> exactly the 4th order statistic
    assert got[0.75] == 4.0


def test_exact_quantiles_interpolates_between_order_stats(spark):
    df = spark.createDataFrame([(1.0,), (2.0,)], "x double")
    got = {r["p"]: r["q"] for r in exact_quantiles(df, "x", [0.25]).collect()}
    # t = 1 + 0.25*1 = 1.25 -> 1 + 0.25*(2-1)
    assert got[0.25] == pytest.approx(1.25)


def test_exact_quantiles_duplicate_heavy(spark):
    # 99 copies of 5.0 and one 100.0: median must be 5.0
    rows = [(5.0,)] * 99 + [(100.0,)]
    df = spark.createDataFrame(rows, "x double").repartition(16)
    got = {r["p"]: r["q"] for r in exact_quantiles(df, "x", [0.5, 0.99]).collect()}
    assert got[0.5] == 5.0
    # t = 1 + .99*99 = 99.01 -> between 99th (5.0) and 100th (100.0)
    assert got[0.99] == pytest.approx(5.0 + 0.01 * 95.0, abs=1e-6)


def test_exact_quantiles_rejects_bad_probs(spark):
    df = spark.createDataFrame([(1.0,)], "x double")
    with pytest.raises(ValueError):
        exact_quantiles(df, "x", [])
    with pytest.raises(ValueError):
        exact_quantiles(df, "x", [1.5])


# ----------------------------------------------------------- robust_outliers


def test_robust_outliers_flags_planted_outlier(spark):
    rows = [("a", float(v)) for v in [10, 11, 12, 13, 14, 1000]]
    df = spark.createDataFrame(rows, "g string, x double")
    (r,) = robust_outliers(df, "g", "x").collect()
    assert r["n"] == 6
    assert r["n_outliers"] == 1
    assert r["med"] == pytest.approx(12.5)


def test_robust_outliers_degenerate_mad(spark):
    # majority identical -> MAD 0 -> anything != median flagged
    rows = [("a", 5.0)] * 6 + [("a", 5.1), ("a", 7.0)]
    df = spark.createDataFrame(rows, "g string, x double")
    (r,) = robust_outliers(df, "g", "x").collect()
    assert r["mad"] == 0.0
    assert r["n_outliers"] == 2


# -------------------------------------------------------------- merge_upsert


def _merge_fixtures(spark):
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k int, s string, v double",
    )
    changes = spark.createDataFrame(
        [
            (2, "b", 99.0, "U", 1),
            (2, "b2", 77.0, "U", 5),  # latest wins
            (3, "c", 30.0, "D", 1),
            (4, "d", 40.0, "I", 1),
        ],
        "k int, s string, v double, op string, seq int",
    )
    return base, changes


def test_merge_upsert_semantics(spark):
    base, changes = _merge_fixtures(spark)
    got = {r["k"]: (r["s"], r["v"]) for r in merge_upsert(base, changes, ["k"], "seq").collect()}
    assert got == {
        1: ("a", 10.0),  # untouched passes through
        2: ("b2", 77.0),  # highest seq wins
        4: ("d", 40.0),  # insert
    }  # 3 deleted


def test_merge_upsert_delete_then_reinsert(spark):
    base = spark.createDataFrame([(1, "a", 1.0)], "k int, s string, v double")
    changes = spark.createDataFrame(
        [(1, "a", 1.0, "D", 1), (1, "a2", 2.0, "I", 2)],
        "k int, s string, v double, op string, seq int",
    )
    got = merge_upsert(base, changes, ["k"], "seq").collect()
    assert [(r["k"], r["s"], r["v"]) for r in got] == [(1, "a2", 2.0)]


# ---------------------------------------------------------------- scd2_build


def test_scd2_collapses_runs_and_chains_intervals(spark):
    rows = [
        (1, 10, "x", 100),
        (1, 20, "x", 101),  # same run
        (1, 30, "y", 102),  # change
        (1, 40, "x", 103),  # change back -> third run
        (2, 10, "z", 104),
    ]
    df = spark.createDataFrame(rows, "k int, t int, a string, eid int")
    hist = scd2_build(df, "k", "t", "a", tiebreak_col="eid").collect()
    by_key = {}
    for r in hist:
        by_key.setdefault(r["k"], []).append(r)
    k1 = sorted(by_key[1], key=lambda r: r["valid_from"])
    assert [(r["a"], r["valid_from"], r["valid_to"], r["n_events"]) for r in k1] == [
        ("x", 10, 30, 2),
        ("y", 30, 40, 1),
        ("x", 40, None, 1),
    ]
    assert [r["is_current"] for r in k1] == [0, 0, 1]
    assert by_key[2][0]["is_current"] == 1


# ------------------------------------------------------------------ pagerank


def test_pagerank_two_node_cycle_is_uniform_fixpoint(spark):
    edges = spark.createDataFrame([(1, 2), (2, 1)], "src int, dst int")
    got = {r["node"]: r["rank"] for r in pagerank(edges, iters=5).collect()}
    assert got == {1: 0.5, 2: 0.5}


def test_pagerank_star_matches_hand_rolled(spark):
    # 1 -> {2,3}: after one iteration r(1)=(1-d)/3, r(2)=r(3)=(1-d)/3+d/6
    edges = spark.createDataFrame([(1, 2), (1, 3)], "src int, dst int")
    got = {r["node"]: r["rank"] for r in pagerank(edges, iters=1, damping=0.85).collect()}
    third = 1.0 / 3.0
    assert got[1] == pytest.approx(0.15 * third, abs=1e-6)
    assert got[2] == pytest.approx(0.15 * third + 0.85 * third / 2, abs=1e-6)
    assert got[2] == got[3]


def test_pagerank_symmetric_graph_conserves_mass(spark):
    pairs = [(i, (i * 3) % 7 + 10) for i in range(7)]
    edges_rows = pairs + [(b, a) for a, b in pairs]
    edges = spark.createDataFrame(edges_rows, "src int, dst int")
    ranks = pagerank(edges, iters=4).collect()
    assert sum(r["rank"] for r in ranks) == pytest.approx(1.0, abs=1e-4)
    assert all(r["rank"] > 0 for r in ranks)


def test_pagerank_zero_iters_is_uniform(spark):
    edges = spark.createDataFrame([(1, 2), (3, 4)], "src int, dst int")
    got = {r["node"]: r["rank"] for r in pagerank(edges, iters=0).collect()}
    assert got == {1: 0.25, 2: 0.25, 3: 0.25, 4: 0.25}


def test_funnel_counts_monotone_and_correct(spark):
    from hdp_tez_spark.extensions.analytics import funnel

    ev = load_table(spark, SF_SMOKE, "events")
    rows = {
        r.stage_idx: r.n_users
        for r in funnel(
            ev, "user_id", "ts", "event_type", ["view", "click", "purchase"]
        ).collect()
    }
    assert set(rows) == {0, 1, 2}
    # conversion can only shrink stage over stage
    assert rows[0] >= rows[1] >= rows[2]
    # stage 0 is exactly the distinct users with a 'view' event
    expected0 = (
        ev.where(F.col("event_type") == "view").select("user_id").distinct().count()
    )
    assert rows[0] == expected0


def test_funnel_strictly_after_semantics(spark):
    """A user whose only stage-2 event PRECEDES their stage-1 completion
    must not convert."""
    import datetime as dt

    from hdp_tez_spark.extensions.analytics import funnel

    t = dt.datetime(2024, 1, 1)
    rows = [
        (1, "a", t),                              # user 1: view then click -> converts
        (1, "b", t + dt.timedelta(minutes=1)),
        (2, "b", t),                              # user 2: click BEFORE view -> no
        (2, "a", t + dt.timedelta(minutes=1)),
    ]
    df = spark.createDataFrame(rows, "user_id int, event_type string, ts timestamp")
    out = {r.stage_idx: r.n_users for r in funnel(df, "user_id", "ts", "event_type", ["a", "b"]).collect()}
    assert out == {0: 2, 1: 1}


# ------------------------------------------------------------ bfs_distances


def test_bfs_distances_path_graph(spark):
    from hdp_tez_spark.extensions.graph import bfs_distances

    # path 1 -> 2 -> 3 -> 4 -> 5: hops bound at 3 stops before node 5
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 5)], "src int, dst int"
    )
    sources = spark.createDataFrame([(1,)], "node int")
    got = {r["node"]: r["dist"] for r in bfs_distances(edges, sources, max_hops=3).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}


def test_bfs_distances_min_over_multiple_paths(spark):
    from hdp_tez_spark.extensions.graph import bfs_distances

    # 1->2->4 and 1->4: node 4 is distance 1, not 2
    edges = spark.createDataFrame(
        [(1, 2), (2, 4), (1, 4), (4, 5)], "src int, dst int"
    )
    sources = spark.createDataFrame([(1,)], "node int")
    got = {r["node"]: r["dist"] for r in bfs_distances(edges, sources, max_hops=3).collect()}
    assert got == {1: 0, 2: 1, 4: 1, 5: 2}


def test_bfs_distances_multi_source_and_unreachable(spark):
    from hdp_tez_spark.extensions.graph import bfs_distances

    edges = spark.createDataFrame(
        [(1, 2), (10, 11), (20, 21)], "src int, dst int"
    )
    sources = spark.createDataFrame([(1,), (10,)], "node int")
    got = {r["node"]: r["dist"] for r in bfs_distances(edges, sources, max_hops=3).collect()}
    # 20/21 unreachable from either source; both sources at dist 0
    assert got == {1: 0, 2: 1, 10: 0, 11: 1}


def test_bfs_distances_zero_hops(spark):
    from hdp_tez_spark.extensions.graph import bfs_distances

    edges = spark.createDataFrame([(1, 2)], "src int, dst int")
    sources = spark.createDataFrame([(1,)], "node int")
    got = bfs_distances(edges, sources, max_hops=0).collect()
    assert [(r["node"], r["dist"]) for r in got] == [(1, 0)]


# ------------------------------------------------------- prefix_filter_join


def test_prefix_filter_join_matches_ngram_jaccard(spark):
    """The prefix-filtered join must produce the identical pair set as
    the all-shared-shingles exact join (zero false negatives/positives)."""
    from hdp_tez_spark.extensions.dedup import ngram_jaccard_pairs, prefix_filter_join

    docs = load_table(spark, SF_SMOKE, "documents").limit(120)
    a = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in prefix_filter_join(docs, "doc_id", "text", threshold=0.4, k=3).collect()
    }
    b = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.4).collect()
    }
    assert a == b
    assert a  # non-vacuous: the smoke corpus has near-dup pairs at 0.4


def test_prefix_filter_join_identical_docs(spark):
    from hdp_tez_spark.extensions.dedup import prefix_filter_join

    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"), (3, "zz yy xx ww")],
        "doc_id int, text string",
    )
    rows = prefix_filter_join(df, "doc_id", "text", threshold=0.9, k=1).collect()
    assert [(r["id_a"], r["id_b"], r["jaccard"]) for r in rows] == [(1, 2, 1.0)]


# ------------------------------------------------------------- ewma_smooth


def test_ewma_matches_reference_formula(spark):
    from hdp_tez_spark.extensions.analytics import ewma_smooth

    vals = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, 5.0, 3.0]
    df = spark.createDataFrame(
        [(1, i, v) for i, v in enumerate(vals)], "k int, i int, v double"
    )
    out = {
        r["i"]: r["ewma"]
        for r in ewma_smooth(df, "k", "i", "v", alpha=0.3, k=4).collect()
    }
    for t in range(len(vals)):
        window = vals[max(0, t - 3): t + 1][::-1]  # newest first
        ws = [0.7 ** j for j in range(len(window))]
        expect = sum(w * x for w, x in zip(ws, window)) / sum(ws)
        assert out[t] == pytest.approx(expect, abs=1e-6)


def test_ewma_first_row_is_value(spark):
    from hdp_tez_spark.extensions.analytics import ewma_smooth

    df = spark.createDataFrame([(1, 0, 42.5), (2, 0, -7.0)], "k int, i int, v double")
    out = {r["k"]: r["ewma"] for r in ewma_smooth(df, "k", "i", "v").collect()}
    assert out == {1: 42.5, 2: -7.0}


def test_ewma_rejects_bad_params(spark):
    from hdp_tez_spark.extensions.analytics import ewma_smooth

    df = spark.createDataFrame([(1, 0, 1.0)], "k int, i int, v double")
    with pytest.raises(ValueError):
        ewma_smooth(df, "k", "i", "v", alpha=0.0)
    with pytest.raises(ValueError):
        ewma_smooth(df, "k", "i", "v", k=0)


# ------------------------------------------------------- point_in_time_join


def test_point_in_time_join_picks_version_valid_at_ts(spark):
    from hdp_tez_spark.extensions.cdc import point_in_time_join

    dim = spark.createDataFrame(
        [
            (1, "v1", "2024-01-01 00:00:00", "2024-01-10 00:00:00"),
            (1, "v2", "2024-01-10 00:00:00", None),
            (2, "w1", "2024-01-05 00:00:00", None),
        ],
        "k int, attr string, valid_from string, valid_to string",
    ).select(
        "k", "attr",
        F.to_timestamp("valid_from").alias("valid_from"),
        F.to_timestamp("valid_to").alias("valid_to"),
    )
    facts = spark.createDataFrame(
        [
            (100, 1, "2024-01-09 23:59:59"),   # v1 (strictly before boundary)
            (101, 1, "2024-01-10 00:00:00"),   # v2 (half-open: boundary -> new)
            (102, 1, "2024-02-01 00:00:00"),   # v2 (current, NULL valid_to)
            (103, 2, "2024-01-01 00:00:00"),   # before first version -> dropped
        ],
        "fid int, k int, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        (r["fid"], r["attr"])
        for r in point_in_time_join(facts, dim, "k", "ts").collect()
    }
    assert got == {(100, "v1"), (101, "v2"), (102, "v2")}


def test_point_in_time_join_left_keeps_prehistory_facts(spark):
    from hdp_tez_spark.extensions.cdc import point_in_time_join

    dim = spark.createDataFrame(
        [(1, "v1", "2024-01-10 00:00:00", None)],
        "k int, attr string, valid_from string, valid_to string",
    ).select(
        "k", "attr",
        F.to_timestamp("valid_from").alias("valid_from"),
        F.to_timestamp("valid_to").alias("valid_to"),
    )
    facts = spark.createDataFrame(
        [(100, 1, "2024-01-01 00:00:00")], "fid int, k int, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    rows = point_in_time_join(facts, dim, "k", "ts", how="left").collect()
    assert len(rows) == 1 and rows[0]["attr"] is None


def test_point_in_time_join_one_version_per_fact_on_scd2(spark):
    """SCD2 intervals partition time, so the join never fans out."""
    from hdp_tez_spark.extensions.cdc import point_in_time_join, scd2_build

    ev = load_table(spark, SF_SMOKE, "events")
    dim = scd2_build(
        ev, key_col="user_id", ts_col="ts", attr_col="event_type",
        tiebreak_col="event_id",
    ).select("user_id", "event_type", "valid_from", "valid_to")
    facts = ev.select("event_id", "user_id", "ts")
    joined = point_in_time_join(facts, dim, "user_id", "ts")
    assert joined.count() == facts.count()
    assert joined.groupBy("event_id").count().agg(F.max("count")).first()[0] == 1


# ------------------------------------------------------- transition_counts


def test_transition_counts_hand_rolled(spark):
    from hdp_tez_spark.extensions.analytics import transition_counts

    rows = [
        (1, 1, "a"), (1, 2, "b"), (1, 3, "b"), (1, 4, "a"),
        (2, 1, "b"), (2, 2, "a"),
    ]
    df = spark.createDataFrame(rows, "k int, i int, s string")
    got = {
        (r["src_state"], r["dst_state"]): r["n_transitions"]
        for r in transition_counts(df, "k", ["i"], "s").collect()
    }
    assert got == {("a", "b"): 1, ("b", "b"): 1, ("b", "a"): 2}


def test_transition_counts_single_event_keys_emit_nothing(spark):
    from hdp_tez_spark.extensions.analytics import transition_counts

    df = spark.createDataFrame(
        [(1, 1, "a"), (2, 1, "b")], "k int, i int, s string"
    )
    assert transition_counts(df, "k", ["i"], "s").count() == 0
