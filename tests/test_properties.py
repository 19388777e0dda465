"""Property-based operator tests (hypothesis): randomized inputs checked
against independent in-Python references — the engine's counterpart of the
reference's randomized testing (`TestFaultTolerance.java:735-744` random
failure injection; SURVEY §5.4). Example counts are small because every
example runs Spark jobs."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from hdp_tez_spark.extensions.dedup import connected_components
from hdp_tez_spark.operators.joins import asof_join, salted_join

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

events = st.lists(
    st.tuples(
        st.integers(0, 3),          # key
        st.integers(0, 50),         # ts
        st.integers(0, 999),        # payload
    ),
    min_size=1,
    max_size=25,
)


@given(left=events, right=events)
@settings(**SETTINGS)
def test_asof_join_matches_pandas_merge_asof(spark, left, right):
    lpdf = pd.DataFrame(left, columns=["k", "ts", "lv"]).drop_duplicates(
        ["k", "ts"]
    )
    rpdf = pd.DataFrame(right, columns=["k", "ts", "rv"]).drop_duplicates(
        ["k", "ts"]
    )
    ldf = spark.createDataFrame(lpdf)
    rdf = spark.createDataFrame(
        rpdf.rename(columns={"ts": "rts"})[["k", "rts", "rv"]]
    )
    got = (
        asof_join(ldf, rdf, on=["k"], left_ts="ts", right_ts="rts", values=["rv"])
        .toPandas()
        .sort_values(["k", "ts"], ignore_index=True)
    )
    want = pd.merge_asof(
        lpdf.sort_values("ts", kind="mergesort"),
        rpdf.sort_values("ts", kind="mergesort"),
        on="ts",
        by="k",
        direction="backward",
        suffixes=("", "_r"),
    ).sort_values(["k", "ts"], ignore_index=True)
    assert list(got["ts"]) == list(want["ts"])
    assert got["rv"].astype("float").fillna(-1).tolist() == want["rv"].astype(
        "float"
    ).fillna(-1).tolist()


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)),
        min_size=1,
        max_size=20,
    )
)
@settings(**SETTINGS)
def test_connected_components_matches_union_find(spark, edges):
    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    # reference: classic union-find
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in parent}
    edf = spark.createDataFrame(pd.DataFrame(edges, columns=["id_a", "id_b"]))
    got = {r.node: r.label for r in connected_components(edf).collect()}
    assert got == want


@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["hot", "a", "b"]), st.integers(0, 99)),
        min_size=1,
        max_size=30,
    )
)
@settings(**SETTINGS)
def test_salted_join_equals_plain_join(spark, rows):
    big = spark.createDataFrame(pd.DataFrame(rows, columns=["k", "v"]))
    dim = spark.createDataFrame(
        pd.DataFrame({"k": ["hot", "a", "b"], "label": ["H", "A", "B"]})
    )
    plain = (
        big.join(dim, "k").groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    )
    salted = (
        salted_join(big, dim, on=["k"], salt_buckets=4)
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert {tuple(r) for r in plain.collect()} == {
        tuple(r) for r in salted.collect()
    }
