"""Training-pipeline operators: sessionize, train_test_split,
dedup_keep_best — behavioral invariants beyond the registry's oracle
match (tests/test_entry_queries.py covers value parity)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hdp_tez_spark.extensions.splits import hash_bucket, train_test_split
from hdp_tez_spark.operators.window import sessionize
from hdp_tez_spark.sources.catalog import load_table
from tests.conftest import SF_SMOKE


def test_sessionize_gap_boundary(spark):
    """Events exactly `gap` apart stay in ONE session (strict > starts a
    new one); one second beyond splits."""
    rows = [
        ("u", 1, "2024-01-01 00:00:00"),
        ("u", 2, "2024-01-01 00:30:00"),   # == gap -> same session
        ("u", 3, "2024-01-01 01:00:01"),   # gap + 1s -> new session
    ]
    df = spark.createDataFrame(rows, "user string, eid int, ts string").withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = sessionize(df, keys=["user"], ts_col="ts", gap="30 minutes",
                     tiebreak=["eid"])
    got = {r.eid: r.session_idx for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 2}


def test_sessionize_single_shuffle(spark):
    """Both window passes share one hash exchange on the keys."""
    ev = load_table(spark, SF_SMOKE, "events")
    out = sessionize(ev, keys=["user_id"], ts_col="ts", gap="30 minutes",
                     tiebreak=["event_id"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_train_test_split_deterministic_across_partitioning(spark):
    """The split is a function of the id alone: repartitioning (and thus
    any retry/reordering) cannot change any row's assignment."""
    docs = load_table(spark, SF_SMOKE, "documents")
    a = train_test_split(docs, "doc_id")
    b = train_test_split(docs.repartition(13), "doc_id")
    mismatch = (
        a.select("doc_id", "split")
        .join(b.select("doc_id", F.col("split").alias("split2")), "doc_id")
        .where(F.col("split") != F.col("split2"))
        .count()
    )
    assert mismatch == 0


def test_train_test_split_fraction_and_no_shuffle(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    out = train_test_split(docs, "doc_id", train_frac=0.9)
    n = docs.count()
    n_train = out.where(F.col("split") == "train").count()
    # md5 buckets are near-uniform; 500 docs -> generous tolerance
    assert 0.8 * n <= n_train <= 0.97 * n
    assert "Exchange" not in out._jdf.queryExecution().executedPlan().toString()
    with pytest.raises(ValueError):
        train_test_split(docs, "doc_id", train_frac=1.5)


def test_hash_bucket_range(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    stats = docs.select(hash_bucket(F.col("doc_id"), 64).alias("b")).agg(
        F.min("b").alias("lo"), F.max("b").alias("hi"),
        F.countDistinct("b").alias("nd"),
    ).collect()[0]
    assert stats.lo >= 0 and stats.hi < 64 and stats.nd > 32


def test_dedup_keep_best_one_keeper_per_cluster(spark):
    from hdp_tez_spark.extensions.dedup import dedup_clusters, dedup_keep_best

    docs = load_table(spark, SF_SMOKE, "documents")
    clusters = dedup_clusters(docs, "doc_id", "text", threshold=0.1)
    best = dedup_keep_best(docs, "doc_id", "text", threshold=0.1)
    # exactly one keeper per distinct cluster rep
    assert best.count() == clusters.select("rep").distinct().count()
    assert best.groupBy("cluster_rep").count().where(F.col("count") > 1).count() == 0
    # the keeper has the max quality in its cluster
    from hdp_tez_spark.extensions.textstats import quality_score

    q = quality_score(docs, "doc_id", "text").select("doc_id", "quality")
    cluster_max = (
        clusters.join(q, "doc_id")
        .groupBy("rep")
        .agg(F.max("quality").alias("max_q"))
    )
    bad = (
        best.join(cluster_max, best.cluster_rep == cluster_max.rep)
        .where(F.col("quality") != F.col("max_q"))
        .count()
    )
    assert bad == 0


def test_bucketed_interval_join_matches_direct_range_join(spark):
    """The bucket-explode rewrite is exact: equal results to the direct
    (nested-loop) range join, including windows spanning bucket
    boundaries and points on interval edges."""
    from pyspark.sql import functions as F

    from hdp_tez_spark.operators.joins import bucketed_interval_join

    points = spark.createDataFrame(
        [(i, f"2024-01-01 00:{m:02d}:00") for i, m in enumerate([0, 4, 5, 9, 10, 30])],
        "pid int, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    wins = spark.createDataFrame(
        [
            (100, "2024-01-01 00:00:00", "2024-01-01 00:05:00"),
            (200, "2024-01-01 00:04:30", "2024-01-01 00:09:30"),
        ],
        "wid int, s string, e string",
    ).select(
        "wid", F.to_timestamp("s").alias("s"), F.to_timestamp("e").alias("e")
    )
    got = {
        (r["pid"], r["wid"])
        for r in bucketed_interval_join(points, wins, "ts", "s", "e", 120).collect()
    }
    direct = {
        (r["pid"], r["wid"])
        for r in points.join(
            wins, (F.col("ts") >= F.col("s")) & (F.col("ts") <= F.col("e"))
        ).collect()
    }
    assert got == direct
    assert (2, 100) in got  # boundary point ts == w_end included
