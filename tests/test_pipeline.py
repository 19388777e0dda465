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
