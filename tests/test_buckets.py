"""Bucketed tables: shuffle-free co-located joins, bucket pruning, and
shuffle-free aggregation on the bucket key — asserted on physical plans."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hdp_tez_spark.sources.buckets import read_bucketed, write_bucketed
from hdp_tez_spark.sources.catalog import load_table
from tests.conftest import SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    """orders + lineitem bucketed by orderkey into the same bucket count,
    in a scratch database so nothing lands in the repo warehouse dir."""
    loc = tmp_path_factory.mktemp("bucketdb")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bktest LOCATION '{loc}'")
    try:
        write_bucketed(
            load_table(spark, SF_SMOKE, "orders"),
            "bktest.orders_b",
            ["o_orderkey"],
            8,
            sort_cols=["o_orderkey"],
        )
        write_bucketed(
            load_table(spark, SF_SMOKE, "lineitem"),
            "bktest.lineitem_b",
            ["l_orderkey"],
            8,
            sort_cols=["l_orderkey"],
        )
        yield spark
    finally:
        spark.sql("DROP DATABASE IF EXISTS bktest CASCADE")


def test_bucketed_join_has_no_exchange(bucketed):
    spark = bucketed
    o = read_bucketed(spark, "bktest.orders_b")
    li = read_bucketed(spark, "bktest.lineitem_b")
    j = li.hint("MERGE").join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        "l_orderkey", "o_totalprice", "l_quantity"
    )
    plan = _plan(j)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan  # the whole point of bucketing
    # and the result is the same as the shuffled join
    want = (
        load_table(spark, SF_SMOKE, "lineitem")
        .join(
            load_table(spark, SF_SMOKE, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .count()
    )
    assert j.count() == want


def test_bucket_pruning_on_equality_predicate(bucketed):
    spark = bucketed
    # autoBucketedScan drops the bucket layout when no join/agg exploits
    # it, which also forfeits pruning — pin it on for the probe (at scale
    # you leave it on for exactly this kind of point lookup).
    prev = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        o = read_bucketed(spark, "bktest.orders_b")
        plan = _plan(o.where(F.col("o_orderkey") == 42))
        assert "SelectedBucketsCount: 1 out of 8" in plan, plan
    finally:
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", prev
        )


def test_bucketed_aggregation_no_exchange(bucketed):
    spark = bucketed
    li = read_bucketed(spark, "bktest.lineitem_b")
    agg = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    plan = _plan(agg)
    assert "Exchange" not in plan, plan
