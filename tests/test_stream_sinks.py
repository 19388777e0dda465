"""Transactional multi-sink streaming commit and the stream admission
gate (streaming/sinks.py)."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from hdp_tez_spark.extensions.textstats import fingerprint
from hdp_tez_spark.sources.catalog import load_table
from hdp_tez_spark.streaming.sinks import (
    commit_batch,
    stream_corpus_gate,
    stream_to_sinks,
)
from tests.conftest import SF_SMOKE


def _doc_stream(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    d = tempfile.mkdtemp(prefix="docs_stream_")
    docs.repartition(3).write.mode("overwrite").parquet(d)
    return spark.readStream.schema(docs.schema).parquet(d), docs


def test_stream_corpus_gate_drops_known_content(spark):
    """Stream docs already fingerprinted in the corpus index are dropped;
    unseen docs pass — and the result matches the batch anti-join twin."""
    sdf, docs = _doc_stream(spark)
    # index half the corpus (doc_id < 250)
    idx = fingerprint(docs.where(F.col("doc_id") < 250), "doc_id", "text")
    gated = stream_corpus_gate(sdf, idx)
    d = tempfile.mkdtemp(prefix="gate_ck_")
    q = (
        gated.writeStream.format("memory")
        .queryName("gated_docs")
        .outputMode("append")
        .option("checkpointLocation", d)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.doc_id for r in spark.table("gated_docs").collect()}
    batch_twin = {
        r.doc_id
        for r in stream_corpus_gate(docs, idx).collect()
    }
    assert got == batch_twin
    # every admitted doc's fingerprint is absent from the index
    admitted_fp = {
        r.fp_md5
        for r in fingerprint(
            docs.join(spark.createDataFrame([(i,) for i in got], "doc_id long"),
                      "doc_id"),
            "doc_id", "text",
        ).collect()
    }
    indexed_fp = {r.fp_md5 for r in idx.collect()}
    assert admitted_fp.isdisjoint(indexed_fp)
    assert got  # gate admits something (unindexed half exists)


def test_commit_batch_all_or_nothing(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(50)
    base = tempfile.mkdtemp(prefix="sink2_")
    ok_a = os.path.join(base, "a")
    # sink b's parent is a *file*, so the staging write must fail
    bad_parent = os.path.join(base, "blocked")
    with open(bad_parent, "w") as f:
        f.write("x")
    bad_b = os.path.join(bad_parent, "b")
    with pytest.raises(Exception):
        commit_batch(docs, 0, {"a": ok_a, "b": bad_b})
    # neither sink published anything, no staging debris in a's dir
    assert not os.path.exists(os.path.join(ok_a, "batch=0"))
    if os.path.exists(ok_a):
        assert not [p for p in os.listdir(ok_a) if "staging" in p]


def test_commit_batch_publishes_and_replays_idempotently(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(50)
    base = tempfile.mkdtemp(prefix="sink3_")
    sinks = {"a": os.path.join(base, "a"), "b": os.path.join(base, "b")}
    out = commit_batch(docs, 7, sinks)
    assert set(out) == {"a", "b"}
    for p in out.values():
        assert spark.read.parquet(p).count() == 50
    # replay of the same batch id is a no-op (exactly-once on restart)
    again = commit_batch(docs, 7, sinks)
    assert again == {}
    assert spark.read.parquet(out["a"]).count() == 50


def test_stream_to_sinks_end_to_end(spark):
    sdf, docs = _doc_stream(spark)
    base = tempfile.mkdtemp(prefix="sink4_")
    sinks = {"x": os.path.join(base, "x"), "y": os.path.join(base, "y")}
    ck = os.path.join(base, "ck")
    q = stream_to_sinks(sdf, sinks, checkpoint=ck).trigger(availableNow=True).start()
    q.awaitTermination(120)
    total = docs.count()
    for p in sinks.values():
        assert spark.read.parquet(p).count() == total
    # identical batch ids published to both sinks
    bx = {d for d in os.listdir(sinks["x"]) if d.startswith("batch=")}
    by = {d for d in os.listdir(sinks["y"]) if d.startswith("batch=")}
    assert bx == by and bx


def test_stream_merge_upsert_incremental_batches(spark):
    """Two incremental availableNow runs against one table: versioned
    snapshots accumulate, the pointer advances atomically, deletes and
    latest-wins updates apply, and untouched keys survive."""
    from hdp_tez_spark.streaming.sinks import read_snapshot, stream_merge_upsert

    src = tempfile.mkdtemp(prefix="cdc_src_")
    tbl = tempfile.mkdtemp(prefix="cdc_tbl_") + "/t"
    ckpt = tempfile.mkdtemp(prefix="cdc_ckpt_")
    schema = "k int, v string, op string, seq long"
    assert read_snapshot(spark, tbl) is None  # nothing published yet

    def run_batch(rows, fname):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{src}/{fname}")
        sdf = spark.readStream.schema(
            spark.createDataFrame([], schema).schema
        ).option("maxFilesPerTrigger", "1").parquet(f"{src}/*")
        q = (
            stream_merge_upsert(sdf, tbl, ["k"], "seq", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # batch 1: inserts, with an in-batch seq race (seq 2 must win for k=1)
    run_batch(
        [(1, "a", "U", 1), (1, "a2", "U", 2), (2, "b", "U", 1), (3, "c", "U", 1)],
        "b1",
    )
    snap1 = {r.k: r.v for r in read_snapshot(spark, tbl).collect()}
    assert snap1 == {1: "a2", 2: "b", 3: "c"}

    # batch 2 (same checkpoint, new file only): update k=1, delete k=2
    run_batch([(1, "a3", "U", 10), (2, "b", "D", 11)], "b2")
    snap2 = {r.k: r.v for r in read_snapshot(spark, tbl).collect()}
    assert snap2 == {1: "a3", 3: "c"}

    # both versions exist on disk; the pointer names the newer one
    versions = sorted(
        d for d in os.listdir(tbl) if d.startswith("v")
    )
    assert len(versions) == 2
    with open(f"{tbl}/_LATEST") as fh:
        assert fh.read().strip() == versions[-1]
