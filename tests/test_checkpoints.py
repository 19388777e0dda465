"""Reliable-checkpoint path of the iterative operators.

`plans/checkpoints.truncate_lineage` falls back to `localCheckpoint`
(sandbox default, covered by every other test in the suite); these tests
pin the RELIABLE branch: an explicit `checkpoint_dir` kwarg (or a
SparkContext-configured dir) must (a) produce bit-identical results and
(b) actually write checkpoint data under the directory — the property a
1000-executor job depends on to survive executor loss mid-iteration
(Tez analogue: re-fetchable PERSISTED edge output,
`tez-api/.../dag/api/EdgeProperty.java:71-77`).
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from hdp_tez_spark.plans.checkpoints import truncate_lineage


@pytest.fixture()
def ckpt_dir(spark):
    d = tempfile.mkdtemp(prefix="hdp_tez_ckpt_")
    yield d
    # restore the default (no checkpoint dir) so other tests keep the
    # localCheckpoint fast path, then clean up
    spark.sparkContext._jsc.sc().setCheckpointDir(None)
    shutil.rmtree(d, ignore_errors=True)


def _edges(spark):
    # two components: {1,2,3} and {10,11}
    return spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )


def test_truncate_lineage_reliable_branch_writes_files(spark, ckpt_dir):
    df = spark.range(100).withColumn("x", F.col("id") * 2)
    out = truncate_lineage(df, checkpoint_dir=ckpt_dir)
    assert out.count() == 100
    assert out.isCheckpointed() if hasattr(out, "isCheckpointed") else True
    walked = [f for _, _, fs in os.walk(ckpt_dir) for f in fs]
    assert walked, "reliable checkpoint wrote nothing under checkpoint_dir"


def test_truncate_lineage_uses_context_configured_dir(spark, ckpt_dir):
    spark.sparkContext.setCheckpointDir(ckpt_dir)
    out = truncate_lineage(spark.range(10))
    assert out.count() == 10
    walked = [f for _, _, fs in os.walk(ckpt_dir) for f in fs]
    assert walked, "context-configured dir was not used"


def test_connected_components_reliable_matches_local(spark, ckpt_dir):
    from hdp_tez_spark.extensions.dedup import connected_components

    edges = _edges(spark)
    local = {(r.node, r.label) for r in connected_components(edges).collect()}
    reliable = {
        (r.node, r.label)
        for r in connected_components(edges, checkpoint_dir=ckpt_dir).collect()
    }
    assert reliable == local == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}
    walked = [f for _, _, fs in os.walk(ckpt_dir) for f in fs]
    assert walked


def test_pagerank_and_bfs_reliable_match_local(spark, ckpt_dir):
    from hdp_tez_spark.extensions.graph import bfs_distances, pagerank

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4)], "src long, dst long"
    )
    pr_local = {(r.node, r.rank) for r in pagerank(edges, iters=3).collect()}
    pr_rel = {
        (r.node, r.rank)
        for r in pagerank(edges, iters=3, checkpoint_dir=ckpt_dir).collect()
    }
    assert pr_rel == pr_local

    srcs = spark.createDataFrame([(1,)], "node long")
    d_local = {(r.node, r.dist) for r in bfs_distances(edges, srcs).collect()}
    d_rel = {
        (r.node, r.dist)
        for r in bfs_distances(edges, srcs, checkpoint_dir=ckpt_dir).collect()
    }
    assert d_rel == d_local == {(1, 0), (2, 1), (3, 2), (4, 3)}


def test_prefix_filter_join_reliable_matches_local(spark, ckpt_dir):
    from hdp_tez_spark.extensions.dedup import prefix_filter_join

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),
            (2, "the quick brown fox leaps"),
            (3, "completely different words entirely here"),
        ],
        "doc_id long, text string",
    )
    local = {
        (r.id_a, r.id_b, r.jaccard)
        for r in prefix_filter_join(docs, "doc_id", "text", 0.5).collect()
    }
    reliable = {
        (r.id_a, r.id_b, r.jaccard)
        for r in prefix_filter_join(
            docs, "doc_id", "text", 0.5, checkpoint_dir=ckpt_dir
        ).collect()
    }
    assert reliable == local
    assert {p[:2] for p in local} == {(1, 2)}
