"""Direct coverage for the thin public wrappers that are otherwise only
exercised through compositions — so every public function in the package
has at least one test that calls it by name."""

from __future__ import annotations

from pyspark.sql import functions as F

from hdp_tez_spark.extensions.dedup import exact_dedup_rows, simhash_fingerprints
from hdp_tez_spark.extensions.matview import rollup_state
from hdp_tez_spark.extensions.textstats import normalized_fp
from hdp_tez_spark.functions.collections import json_get, json_parse
from hdp_tez_spark.operators.aggregates import count_by_key, group_agg
from hdp_tez_spark.operators.setops import union_all
from hdp_tez_spark.operators.window import with_rank, with_row_number
from hdp_tez_spark.session import default_parallelism, tuned_builder
from hdp_tez_spark.sources.catalog import register_views
from tests.conftest import SF_SMOKE


def test_exact_dedup_rows_keeps_first_by_id(spark):
    df = spark.createDataFrame(
        [(3, "same"), (1, "same"), (2, "other")], "id int, text string"
    )
    kept = {r["id"] for r in exact_dedup_rows(df, "id", "text").collect()}
    assert kept == {1, 2}


def test_simhash_fingerprints_deterministic_per_content(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "zz yy xx")],
        "id int, text string",
    )
    fp = {r["doc"]: r["simhash"] for r in simhash_fingerprints(df, "id", "text").collect()}
    assert fp[1] == fp[2] and fp[1] != fp[3]


def test_rollup_state_is_mergeable_partials(spark):
    df = spark.createDataFrame(
        [("d1", "a", 1.0), ("d1", "a", 2.0)], "day string, k string, v double"
    )
    r = rollup_state(df, "day", ["k"], "v").collect()[0]
    assert (r["cnt"], r["total"]) == (2, 3.0)


def test_normalized_fp_ignores_case_and_whitespace(spark):
    df = spark.createDataFrame(
        [("  Hello   World ",), ("hello world",)], "t string"
    )
    fps = [r["fp"] for r in df.select(normalized_fp(F.col("t")).alias("fp")).collect()]
    assert fps[0] == fps[1]


def test_json_get_and_parse(spark):
    df = spark.createDataFrame([('{"k": 7}',)], "j string")
    row = df.select(
        json_get(F.col("j"), "$.k").alias("s"),
        json_parse(F.col("j"), "k int").alias("p"),
    ).collect()[0]
    assert row["s"] == "7" and row["p"]["k"] == 7


def test_group_agg_and_count_by_key(spark):
    df = spark.createDataFrame([("a", 1), ("a", 2), ("b", 3)], "k string, v int")
    g = {r["k"]: r["s"] for r in group_agg(df, ["k"], [F.sum("v").alias("s")]).collect()}
    assert g == {"a": 3, "b": 3}
    c = {r["k"]: r["cnt"] for r in count_by_key(df, "k").collect()}
    assert c == {"a": 2, "b": 1}


def test_union_all_concatenates(spark):
    a = spark.createDataFrame([(1,)], "x int")
    b = spark.createDataFrame([(2,)], "x int")
    assert union_all([a, b]).count() == 2
    import pytest

    with pytest.raises(ValueError):
        union_all([])


def test_with_rank_and_row_number(spark):
    df = spark.createDataFrame(
        [("g", 10), ("g", 10), ("g", 5)], "k string, v int"
    )
    ranked = with_rank(df, ["k"], [F.col("v").desc()]).collect()
    assert sorted(r["rank"] for r in ranked) == [1, 1, 3]
    rn = with_row_number(df, ["k"], [F.col("v").desc(), F.col("v")]).collect()
    assert sorted(r["rn"] for r in rn) == [1, 2, 3]


def test_register_views_exposes_all_tables(spark):
    register_views(spark, SF_SMOKE)
    assert spark.sql("SELECT count(*) FROM nation").first()[0] > 0
    assert spark.sql("SELECT count(*) FROM documents").first()[0] > 0


def test_session_helpers(spark):
    assert default_parallelism() >= 1
    b = tuned_builder("wrapper-test")
    assert b is not None  # builder carries the profile; getOrCreate untested
    # (would return the shared session)
