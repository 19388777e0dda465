"""Structured Streaming forms match their batch twins (Spark's unified
model, exercised end-to-end with availableNow over the events table)."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from hdp_tez_spark.sources.catalog import load_table
from hdp_tez_spark.streaming import windows as WIN
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def event_stream(spark):
    """The events table re-materialized as a file-source stream."""
    ev = load_table(spark, SF_SMOKE, "events")
    d = tempfile.mkdtemp(prefix="events_stream_")
    # several files so the stream has multiple input splits
    ev.repartition(4).write.mode("overwrite").parquet(d)
    schema = ev.schema
    return spark.readStream.schema(schema).parquet(d), ev


def _run_stream(sdf, mode="complete"):
    d = tempfile.mkdtemp(prefix="sink_")
    q = (
        sdf.writeStream.format("memory")
        .queryName(f"q_{abs(hash(d))}"
        )
        .outputMode(mode)
        .option("checkpointLocation", d)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    name = q.name
    return name


def _rows(spark, name):
    return {tuple(r) for r in spark.table(name).collect()}


def test_stream_tumbling_matches_batch(spark, event_stream):
    sdf, ev = event_stream
    aggs = [F.count(F.lit(1)).alias("cnt"), F.round(F.sum("value"), 4).alias("total")]
    streamed = WIN.stream_tumbling_agg(
        sdf, "ts", "1 hour", ["event_type"], aggs, watermark="2 hours"
    )
    name = _run_stream(streamed, mode="complete")
    batch = WIN.tumbling_agg(ev, "ts", "1 hour", ["event_type"], aggs)
    assert _rows(spark, name) == {tuple(r) for r in batch.collect()}


def test_stream_session_matches_batch(spark, event_stream):
    sdf, ev = event_stream
    aggs = [F.count(F.lit(1)).alias("n_events")]
    streamed = WIN.stream_session_agg(
        sdf, "ts", "30 minutes", ["user_id"], aggs, watermark="2 hours"
    )
    name = _run_stream(streamed, mode="complete")
    batch = WIN.session_agg(ev, "ts", "30 minutes", ["user_id"], aggs)
    assert _rows(spark, name) == {tuple(r) for r in batch.collect()}


def test_stream_dedup_matches_batch(spark, event_stream):
    sdf, ev = event_stream
    streamed = WIN.stream_dedup(sdf, ["user_id", "event_type"], "ts", watermark="2 hours")
    name = _run_stream(streamed, mode="append")
    got = spark.table(name).groupBy("user_id", "event_type").count()
    # streaming dropDuplicates keeps exactly one row per key (which row is
    # arrival-order dependent; the *set of keys* is the deterministic part)
    assert got.where(F.col("count") > 1).count() == 0
    batch_keys = {
        (r.user_id, r.event_type)
        for r in ev.select("user_id", "event_type").distinct().collect()
    }
    stream_keys = {
        (r.user_id, r.event_type)
        for r in spark.table(name).select("user_id", "event_type").collect()
    }
    assert stream_keys == batch_keys


def test_stream_stream_interval_join_matches_batch(spark, event_stream):
    """Watermarked stream-stream interval join produces exactly the batch
    join's pairs (bounded state via the time-range condition)."""
    sdf, ev = event_stream
    def split(df, typ, ts_name, extra):
        out = df.where(F.col("event_type") == typ).select(
            F.col("event_id").alias(f"{typ}_id"),
            F.col("user_id").alias(f"{typ}_user"),
            F.col("ts").alias(ts_name),
            *extra,
        )
        return out

    s_clicks = split(sdf, "click", "click_ts", []).withWatermark("click_ts", "1 hour")
    s_purch = split(sdf, "purchase", "p_ts", ["value"]).withWatermark("p_ts", "1 hour")
    cond = (
        (F.col("click_user") == F.col("purchase_user"))
        & (F.col("p_ts") >= F.col("click_ts") - F.expr("INTERVAL 10 minutes"))
        & (F.col("p_ts") <= F.col("click_ts"))
    )
    streamed = s_clicks.join(s_purch, cond).select("click_id", "purchase_id")
    name = _run_stream(streamed, mode="append")
    b_clicks = split(ev, "click", "click_ts", [])
    b_purch = split(ev, "purchase", "p_ts", ["value"])
    batch = b_clicks.join(b_purch, cond).select("click_id", "purchase_id")
    assert _rows(spark, name) == {tuple(r) for r in batch.collect()}


def test_stream_left_outer_interval_join_matches_batch(spark):
    """Left-outer stream-stream interval join: unmatched left rows are
    emitted by watermark eviction. A far-future sentinel on EACH side
    pushes both watermarks past all real data so the availableNow drain
    flushes every unmatched click; sentinels are filtered AFTER the
    drain (filtering inside the streaming plan would be pushed below the
    watermark operators and starve them of the sentinels)."""
    import datetime

    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    far = datetime.datetime(2030, 1, 1)
    sent = spark.createDataFrame(
        [(-98, -1, far, "click", 0.0), (-99, -1, far, "purchase", 0.0)], ev.schema
    )
    d = tempfile.mkdtemp(prefix="events_loj_")
    ev.unionByName(sent).coalesce(1).write.mode("overwrite").parquet(d)
    sdf = spark.readStream.schema(ev.schema).parquet(d)

    def clicks_of(df):
        return df.where(F.col("event_type") == "click").select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("click_ts"),
        )

    def purch_of(df):
        return df.where(F.col("event_type") == "purchase").select(
            F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"), "value"
        )

    cond_of = lambda: (
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("click_ts") - F.expr("INTERVAL 10 minutes"))
        & (F.col("p_ts") <= F.col("click_ts"))
    )
    streamed = (
        clicks_of(sdf)
        .withWatermark("click_ts", "1 hour")
        .join(purch_of(sdf).withWatermark("p_ts", "1 hour"), cond_of(), "left_outer")
        .select("click_id", "user_id", "click_ts", "p_ts", "value")
    )
    name = _run_stream(streamed, mode="append")
    got = {
        tuple(r)
        for r in spark.table(name).where(F.col("user_id") >= 0).collect()
    }
    batch = (
        clicks_of(ev)
        .join(purch_of(ev), cond_of(), "left_outer")
        .select("click_id", "user_id", "click_ts", "p_ts", "value")
    )
    want = {tuple(r) for r in batch.collect()}
    assert got == want
    # non-vacuous: the join has both matched and unmatched clicks
    assert any(r[3] is None for r in want) and any(r[3] is not None for r in want)


def test_interval_join_left_outer_batch_form(spark):
    """Batch form of interval_join(how='left_outer') keeps unmatched
    left rows with NULL right columns."""
    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (2, "2024-01-01 12:00:00")],
        "k int, lts string",
    ).withColumn("lts", F.to_timestamp("lts"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 09:55:00", 7.0)], "k int, rts string, v double"
    ).withColumn("rts", F.to_timestamp("rts"))
    out = WIN.interval_join(
        left, right, ["k"], "lts", "rts", "10 minutes", how="left_outer"
    ).select(left["k"], "rts", "v")
    got = {(r["k"], r["rts"] is None, r["v"]) for r in out.collect()}
    assert got == {(1, False, 7.0), (2, True, None)}


def test_stream_static_enrich_matches_batch(spark, event_stream):
    """Stream-static dim join + windowed agg equals the batch twin; no
    state store is involved on the static side."""
    sdf, ev = event_stream
    dim = load_table(spark, SF_SMOKE, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    aggs = [F.count(F.lit(1)).alias("cnt"), F.round(F.sum("value"), 4).alias("total")]
    streamed = WIN.stream_tumbling_agg(
        WIN.stream_static_enrich(sdf, dim, "user_id"),
        "ts", "1 hour", ["c_mktsegment"], aggs, watermark="2 hours",
    )
    name = _run_stream(streamed, mode="complete")
    batch = WIN.tumbling_agg(
        ev.join(dim, "user_id"), "ts", "1 hour", ["c_mktsegment"], aggs
    )
    got = _rows(spark, name)
    assert got == {tuple(r) for r in batch.collect()}
    assert got, "enrichment produced no rows — dim keys never matched"
