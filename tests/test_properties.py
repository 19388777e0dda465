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


docs_strategy = st.lists(
    st.tuples(
        st.integers(0, 10_000),  # id (deduped below)
        st.lists(
            st.sampled_from("alpha bravo charlie delta echo fox".split()),
            min_size=0,
            max_size=12,
        ),
    ),
    min_size=1,
    max_size=16,
)


@given(train=docs_strategy, test=docs_strategy)
@settings(**SETTINGS)
def test_decontaminate_matches_python_ngram_intersection(spark, train, test):
    """decontaminate == brute-force distinct-3-gram intersection."""
    from hdp_tez_spark.extensions.curation import decontaminate

    def dedup_ids(rows):
        seen, out = set(), []
        for i, toks in rows:
            if i not in seen:
                seen.add(i)
                out.append((i, " ".join(toks)))
        return out

    tr, te = dedup_ids(train), dedup_ids(test)

    def shingles(text):
        toks = [t for t in text.lower().split() if t]
        if len(toks) >= 3:
            return {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}
        return {" ".join(toks)}

    te_sh = set().union(*(shingles(t) for _, t in te)) if te else set()
    expected = {
        i: len(shingles(t) & te_sh) for i, t in tr
    }
    tdf = spark.createDataFrame(tr, "id long, text string")
    edf = spark.createDataFrame(te, "id long, text string")
    got = {
        r.id: r.n_hits for r in decontaminate(tdf, edf, "id", "text").collect()
    }
    assert got == expected


@given(rows=st.lists(
    st.tuples(st.integers(0, 10_000), st.integers(0, 40)),
    min_size=1, max_size=30,
))
@settings(**SETTINGS)
def test_pack_sequences_conserves_layout(spark, rows):
    """Every doc is assigned once; within each bucket the offsets are the
    exact running token sum in md5 order (no gaps, no overlaps)."""
    import hashlib

    from hdp_tez_spark.extensions.curation import pack_sequences

    uniq = {}
    for i, n in rows:
        uniq.setdefault(i, n)
    data = sorted(uniq.items())
    df = spark.createDataFrame(data, "id long, n long")
    budget, buckets = 17, 4
    got = pack_sequences(df, "id", "n", budget, num_buckets=buckets).collect()
    assert len(got) == len(data)
    by_bucket = {}
    for r in got:
        by_bucket.setdefault(r.bucket, []).append(r)
    for b, rs in by_bucket.items():
        # reference order: md5 of the id string, then id
        rs_ref = sorted(rs, key=lambda r: (hashlib.md5(str(r.id).encode()).hexdigest(), r.id))
        pos = 0
        for r in rs_ref:
            assert r.pack_idx == pos // budget
            assert r.pack_offset == pos % budget
            pos += r.n
