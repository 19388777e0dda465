"""Custom stateful streaming operators (applyInPandasWithState) keep
correct per-key state across micro-batches: the final state must equal the
batch aggregate over the same data, and sessionization must match
F.session_window's closed sessions."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from hdp_tez_spark.sources.catalog import load_table
from hdp_tez_spark.streaming import stateful as ST
from hdp_tez_spark.streaming import windows as WIN
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def multi_batch_stream(spark):
    """events as a file stream forced through several micro-batches
    (maxFilesPerTrigger=1 over 4 files)."""
    ev = load_table(spark, SF_SMOKE, "events")
    d = tempfile.mkdtemp(prefix="events_mb_")
    ev.repartition(4).write.mode("overwrite").parquet(d)
    sdf = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    return sdf, ev


def _run(sdf, mode):
    d = tempfile.mkdtemp(prefix="ckpt_")
    q = (
        sdf.writeStream.format("memory")
        .queryName(f"st_{abs(hash(d))}")
        .outputMode(mode)
        .option("checkpointLocation", d)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return q.name


def test_running_totals_final_state_matches_batch(spark, multi_batch_stream):
    sdf, ev = multi_batch_stream
    streamed = ST.running_totals(
        sdf, ["user_id"], "value", key_types="user_id long"
    )
    name = _run(streamed, "update")
    # update mode emits one row per key per batch; the last emission per key
    # (max cnt) is the final state
    out = spark.table(name)
    final = out.groupBy("user_id").agg(
        F.max_by("total", "cnt").alias("total"), F.max("cnt").alias("cnt")
    )
    batch = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("total")
    )
    got = {(r.user_id, r.cnt, round(r.total, 6)) for r in final.collect()}
    want = {(r.user_id, r.cnt, round(r.total, 6)) for r in batch.collect()}
    assert got == want
    # multiple micro-batches actually happened (state carried across them)
    assert out.count() > batch.count()


def test_sessionize_closed_sessions_match_session_window(spark):
    """Single-batch run: every session except each key's last (still open)
    must match F.session_window exactly."""
    ev = load_table(spark, SF_SMOKE, "events")
    d = tempfile.mkdtemp(prefix="events_sb_")
    ev.coalesce(1).write.mode("overwrite").parquet(d)
    sdf = spark.readStream.schema(ev.schema).parquet(d)
    streamed = ST.sessionize(
        sdf, "user_id", "ts", gap_seconds=1800, key_type="long"
    )
    name = _run(streamed, "append")
    got = {
        (r.user_id, r.session_start, r.n_events)
        for r in spark.table(name).collect()
    }
    batch = WIN.session_agg(
        ev, "ts", "30 minutes", ["user_id"], [F.count(F.lit(1)).alias("n_events")]
    )
    # drop each user's last session (open in the streaming view).
    # session_agg's session_end = last_ts + gap, ours = last event ts; compare
    # on (user, start, count) which both define identically
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("session_start").desc())
    closed = (
        batch.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") > 1)
        .drop("rn")
    )
    want = {
        (r.user_id, r.session_start, r.n_events) for r in closed.collect()
    }
    assert got == want
