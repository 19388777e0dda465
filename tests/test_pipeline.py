"""Pipeline façade: Tez-style DAG programs produce the same results as the
direct DataFrame queries (WordCount / JoinValidate / Union parity —
tez-examples WordCount.java, JoinValidate.java, UnionExample.java)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hdp_tez_spark.functions.text import explode_tokens, word_count
from hdp_tez_spark.operators.joins import join_validate
from hdp_tez_spark.plans.pipeline import BROADCAST, ONE_TO_ONE, SCATTER_GATHER, Pipeline
from hdp_tez_spark.sources.catalog import load_table
from tests.conftest import SF_SMOKE


def test_wordcount_dag(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    p = Pipeline("wordcount")
    p.source("docs", docs)
    p.vertex("tokenize", lambda ins: explode_tokens(ins["docs"], "text"))
    p.edge("docs", "tokenize")
    p.vertex(
        "count",
        lambda ins: ins["tokenize"].groupBy("word").agg(F.count(F.lit(1)).alias("cnt")),
    )
    p.edge("tokenize", "count", movement=SCATTER_GATHER, keys=["word"])
    out = p.run()["count"]
    expect = {(r.word, r.cnt) for r in word_count(docs, "text").collect()}
    assert {(r.word, r.cnt) for r in out.collect()} == expect


def test_join_validate_dag(spark):
    orders = load_table(spark, SF_SMOKE, "orders").select(
        F.col("o_orderkey").alias("key")
    )
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        F.col("l_orderkey").alias("key")
    )
    p = Pipeline("join_validate")
    p.source("lhs", orders)
    p.source("rhs", li)
    p.vertex("validate", lambda ins: join_validate(ins["lhs"], ins["rhs"], on=["key"]))
    p.edge("lhs", "validate", movement=SCATTER_GATHER, keys=["key"])
    p.edge("rhs", "validate", movement=SCATTER_GATHER, keys=["key"])
    rows = {(r.side, r.missing) for r in p.run()["validate"].collect()}
    direct = {(r.side, r.missing) for r in join_validate(orders, li, on=["key"]).collect()}
    assert rows == direct
    # rhs keys (lineitem) are a subset check: every lineitem has its order
    assert ("right_only", 0) in rows


def test_vertex_group_union(spark):
    orders = load_table(spark, SF_SMOKE, "orders")
    p = Pipeline("union")
    p.source("even", orders.where(F.col("o_orderkey") % 2 == 0))
    p.source("odd", orders.where(F.col("o_orderkey") % 2 == 1))
    p.vertex_group("all", ["even", "odd"])
    p.vertex("count", lambda ins: ins["all"].agg(F.count(F.lit(1)).alias("n")))
    p.edge("all", "count")
    assert p.run()["count"].collect()[0].n == orders.count()


def test_broadcast_edge(spark):
    orders = load_table(spark, SF_SMOKE, "orders")
    customer = load_table(spark, SF_SMOKE, "customer")
    p = Pipeline("bcast")
    p.source("orders", orders)
    p.source("customer", customer)
    p.vertex(
        "join",
        lambda ins: ins["orders"].join(
            ins["customer"], ins["orders"].o_custkey == ins["customer"].c_custkey
        ),
    )
    p.edge("orders", "join")
    p.edge("customer", "join", movement=BROADCAST)
    out = p.run()["join"]
    assert "BroadcastHashJoin" in out._jdf.queryExecution().executedPlan().toString()
    assert out.count() == orders.count()


def test_cycle_detection(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    p = Pipeline("cyclic")
    p.source("a", docs)
    p.vertex("b", lambda ins: ins["a"])
    p.vertex("c", lambda ins: ins["b"])
    p.edge("a", "b")
    p.edge("b", "c")
    p.edge("c", "b")
    with pytest.raises(ValueError, match="cycle"):
        p.run()


def test_bad_edge_validation(spark):
    p = Pipeline("bad")
    with pytest.raises(ValueError, match="movement"):
        p.edge("x", "y", movement="teleport")
    with pytest.raises(ValueError, match="keys"):
        p.edge("x", "y", movement=SCATTER_GATHER)


def test_range_edge_total_order(spark):
    """RANGE movement produces a range-partitioned (total-order) DAG —
    EdgeManagerPlugin range-routing parity."""
    from hdp_tez_spark.plans.pipeline import RANGE

    li = load_table(spark, SF_SMOKE, "lineitem")
    p = Pipeline("range_sort")
    p.source("li", li)
    p.vertex(
        "sorted",
        lambda ins: ins["li"].sortWithinPartitions("l_quantity").select(
            "l_orderkey", "l_quantity"
        ),
    )
    p.edge("li", "sorted", movement=RANGE, keys=["l_quantity"], num_partitions=4)
    out = p.run()["sorted"]
    assert "rangepartitioning" in out._jdf.queryExecution().toString().lower()
    # per-partition maxima must be globally non-decreasing across partitions
    import pandas as pd

    parts = out.withColumn("pid", F.spark_partition_id()).groupBy("pid").agg(
        F.min("l_quantity").alias("lo"), F.max("l_quantity").alias("hi")
    ).orderBy("pid").collect()
    for prev, cur in zip(parts, parts[1:]):
        assert prev.hi <= cur.lo


def test_custom_edge_movement_fn(spark):
    from hdp_tez_spark.plans.pipeline import CUSTOM

    li = load_table(spark, SF_SMOKE, "lineitem")
    p = Pipeline("custom_route")
    p.source("li", li)
    p.vertex("agg", lambda ins: ins["li"].groupBy("l_returnflag").count())
    p.edge(
        "li", "agg", movement=CUSTOM,
        movement_fn=lambda df: df.repartition(6, F.col("l_returnflag")),
    )
    rows = p.run()["agg"].collect()
    assert {r.l_returnflag for r in rows} == {
        r.l_returnflag for r in li.select("l_returnflag").distinct().collect()
    }
    with pytest.raises(ValueError, match="movement_fn"):
        Pipeline("bad").edge("a", "b", movement=CUSTOM)


def test_multi_sink_commit_success(spark, tmp_path):
    """Both sinks become visible, atomically, after run_and_commit."""
    orders = load_table(spark, SF_SMOKE, "orders")
    p = Pipeline("two_sinks")
    p.source("orders", orders)
    p.vertex("hi", lambda ins: ins["orders"].where(F.col("o_totalprice") > 100000))
    p.vertex("lo", lambda ins: ins["orders"].where(F.col("o_totalprice") <= 100000))
    p.edge("orders", "hi")
    p.edge("orders", "lo")
    hi_path, lo_path = str(tmp_path / "hi"), str(tmp_path / "lo")
    p.sink("hi", hi_path).sink("lo", lo_path)
    committed = p.run_and_commit()
    assert set(committed) == {"hi", "lo"}
    n_hi = spark.read.parquet(hi_path).count()
    n_lo = spark.read.parquet(lo_path).count()
    assert n_hi + n_lo == orders.count()
    # no staging residue
    assert not [d for d in tmp_path.iterdir() if "__staging" in d.name]


def test_multi_sink_commit_all_or_nothing(spark, tmp_path):
    """If the second sink's write fails, the first sink must NOT appear —
    DAGImpl.commitOrAbortOutputs parity (TestTezJobs.java:932,965)."""
    orders = load_table(spark, SF_SMOKE, "orders")

    def boom(ins):
        from pyspark.sql.types import LongType
        from pyspark.sql.functions import udf

        fail = udf(lambda x: 1 // 0, LongType())  # divides by zero at write time
        return ins["orders"].select(fail(F.col("o_orderkey")).alias("x"))

    p = Pipeline("failing")
    p.source("orders", orders)
    p.vertex("good", lambda ins: ins["orders"].limit(10))
    p.vertex("bad", boom)
    p.edge("orders", "good")
    p.edge("orders", "bad")
    good_path, bad_path = str(tmp_path / "good"), str(tmp_path / "bad")
    p.sink("good", good_path).sink("bad", bad_path)
    with pytest.raises(Exception):
        p.run_and_commit()
    import os

    assert not os.path.exists(good_path)
    assert not os.path.exists(bad_path)
    assert not [d for d in tmp_path.iterdir() if "__staging" in d.name]


def test_sink_mode_error_preflight(spark, tmp_path):
    """mode='error' refuses to clobber an existing target before any write."""
    orders = load_table(spark, SF_SMOKE, "orders")
    target = tmp_path / "out"
    target.mkdir()
    p = Pipeline("noclobber")
    p.source("orders", orders)
    p.sink("orders", str(target), mode="error")
    with pytest.raises(FileExistsError):
        p.run_and_commit()


def test_session_warm_up(spark):
    """PreWarmVertex parity: warm_up runs a no-op shuffle and returns the
    session."""
    from hdp_tez_spark.session import warm_up

    assert warm_up(spark) is spark


def test_object_registry_scopes(spark):
    """ObjectRegistry parity: named persisted entries, scope eviction."""
    from hdp_tez_spark.plans.pipeline import ObjectRegistry
    from hdp_tez_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    reg = ObjectRegistry()
    nation = load_table(spark, SF_SMOKE, "nation")
    cached = reg.cache("dim_nation", nation, scope="session")
    assert cached.count() == nation.count()
    assert cached.storageLevel.useMemory
    reg.cache("tmp", nation.limit(5), scope="dag")
    assert reg.get("tmp") is not None
    reg.clear("dag")
    assert reg.get("tmp") is None
    assert reg.get("dim_nation") is not None
    reg.clear()
    assert not cached.storageLevel.useMemory
