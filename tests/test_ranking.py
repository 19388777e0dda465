"""Ranking / retrieval / chunking operators: behavioral invariants beyond
the registry's oracle match (tfidf, bm25, inverted index, exact heavy
hitters, document chunking, exact ntile, bloom decontamination,
null-safe join)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from hdp_tez_spark.extensions.curation import (
    bloom_decontaminate,
    chunk_documents,
    decontaminate,
)
from hdp_tez_spark.extensions.ranking import (
    bm25_score,
    heavy_hitters,
    inverted_index,
    tfidf_top_terms,
)
from hdp_tez_spark.operators.joins import null_safe_join
from hdp_tez_spark.operators.sort import ntile_exact
from hdp_tez_spark.sources.catalog import load_table
from tests.conftest import SF_SMOKE


def _docs(spark, rows):
    return spark.createDataFrame(rows, "id long, text string")


def test_tfidf_rare_term_outranks_common(spark):
    df = _docs(
        spark,
        [
            (1, "zebra common common common"),
            (2, "common common"),
            (3, "common filler words"),
        ],
    )
    top = tfidf_top_terms(df, "id", "text", k=1).collect()
    d1 = next(r for r in top if r.id == 1)
    # "zebra" appears once in one doc; "common" in every doc — despite
    # tf("common")=3 in doc 1, idf crushes it only if df dominates:
    # score(zebra) = 1*(ln(4/2)+1) ~ 1.69; score(common) = 3*(ln(4/4)+1) = 3.
    # So common wins on tf here — assert the actual ordering is by score.
    scores = {
        (r.term): r.score
        for r in tfidf_top_terms(df, "id", "text", k=10).collect()
        if r.id == 1
    }
    assert scores["common"] == pytest.approx(3 * (math.log(4 / 4) + 1), abs=1e-6)
    assert scores["zebra"] == pytest.approx(1 * (math.log(4 / 2) + 1), abs=1e-6)
    assert d1.term == "common"


def test_tfidf_k_bounds_output(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    out = tfidf_top_terms(docs, "doc_id", "text", k=2)
    per_doc = out.groupBy("doc_id").count().agg(F.max("count")).collect()[0][0]
    assert per_doc <= 2


def test_bm25_exact_phrase_doc_ranks_first(spark):
    df = _docs(
        spark,
        [
            (1, "spark sql engine"),
            (2, "spark spark spark spark unrelated filler text here"),
            (3, "nothing relevant at all"),
        ],
    )
    got = bm25_score(df, "id", "text", ["spark", "sql"], limit=3).collect()
    assert got[0].id == 1  # matches both query terms, short doc
    assert {r.id for r in got} == {1, 2}  # doc 3 has no query term


def test_inverted_index_postings_and_df_bounds(spark):
    df = _docs(spark, [(1, "a b"), (2, "b c"), (3, "b"), (10, "a")])
    idx = {r.term: r for r in
           inverted_index(df, "id", "text", min_df=1, max_df=2).collect()}
    # "b" has df=3 > max_df — pruned; postings sorted as STRINGS
    assert "b" not in idx
    assert idx["a"].df == 2 and idx["a"].postings == "1,10"
    assert idx["c"].postings == "2"


def test_heavy_hitters_matches_exact_groupby(spark):
    """MG candidates + recount must equal the plain exact computation."""
    docs = load_table(spark, SF_SMOKE, "documents")
    got = {
        (r.term, r.cnt) for r in heavy_hitters(docs, "doc_id", "text", denom=32).collect()
    }
    from hdp_tez_spark.functions.text import explode_tokens

    toks = explode_tokens(docs, "text", "term")
    total = toks.count()
    exact = {
        (r.term, r.cnt)
        for r in toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") * 32 >= total)
        .collect()
    }
    assert got == exact and len(exact) > 0


def test_heavy_hitters_small_capacity_still_exact(spark):
    """Even with capacity far below the vocabulary size, the MG superset
    guarantee keeps the final answer exact."""
    rows = [(i, "hot " * 50 + f"cold{i} rare{i} x{i}") for i in range(40)]
    df = _docs(spark, rows)
    got = heavy_hitters(df, "id", "text", denom=4).collect()
    # "hot" is 2000 of ~2120 tokens; everything else is a singleton
    assert [(r.term) for r in got] == ["hot"]
    assert got[0].cnt == 2000


def test_chunk_documents_boundaries(spark):
    df = _docs(
        spark,
        [
            (1, " ".join(f"t{i}" for i in range(20))),  # 20 tokens
            (2, "short doc"),  # 2 tokens -> one chunk
            (3, "...,,,!!!"),  # zero tokens -> no chunks
        ],
    )
    out = chunk_documents(df, "id", "text", chunk_size=16, stride=12)
    rows = {(r.id, r.chunk_idx): r for r in out.collect()}
    assert (3, 0) not in {k for k in rows} and all(k[0] != 3 for k in rows)
    assert rows[(2, 0)].chunk == "short doc" and rows[(2, 0)].n_chunk_tokens == 2
    # doc 1: starts 0 and 12; window 12 covers tokens 12..19 (8 new)
    assert rows[(1, 0)].n_chunk_tokens == 16
    assert rows[(1, 1)].n_chunk_tokens == 8
    assert rows[(1, 1)].chunk.split(" ")[0] == "t12"
    # overlap: window 1 repeats tokens 12..15 of window 0
    assert rows[(1, 0)].chunk.split(" ")[12:] == rows[(1, 1)].chunk.split(" ")[:4]


def test_chunk_documents_no_degenerate_tail(spark):
    """A trailing window fully contained in the previous one is dropped."""
    df = _docs(spark, [(1, " ".join(f"t{i}" for i in range(13)))])
    out = chunk_documents(df, "id", "text", chunk_size=16, stride=12).collect()
    # start 12 would cover only t12 — already inside window 0 (t0..t12<16)
    assert len(out) == 1 and out[0].n_chunk_tokens == 13


def test_ntile_exact_equal_buckets(spark):
    df = spark.range(100).select(F.col("id"))
    out = ntile_exact(df, [F.col("id")], 10)
    sizes = {r.bucket: r.cnt for r in
             out.groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert sizes == {i: 10 for i in range(10)}
    # bucket respects the order: ids 0-9 in bucket 0
    lo = {r.id for r in out.where(F.col("bucket") == 0).collect()}
    assert lo == set(range(10))


def test_ntile_exact_ragged(spark):
    """103 rows, 10 buckets: floor formula spreads remainder, every bucket
    size in {10, 11}, assignment monotone in rank."""
    df = spark.range(103)
    out = ntile_exact(df, [F.col("id")], 10).collect()
    by_id = sorted((r.id, r.bucket) for r in out)
    buckets = [b for _, b in by_id]
    assert buckets == sorted(buckets)  # monotone
    from collections import Counter

    sizes = Counter(buckets)
    assert set(sizes.values()) <= {10, 11} and len(sizes) == 10


def test_bloom_decontaminate_equals_exact(spark):
    """The Bloom path must reproduce the exact operator bit-for-bit —
    false positives only cost verification work, never change output."""
    docs = load_table(spark, SF_SMOKE, "documents")
    from hdp_tez_spark.extensions.splits import train_test_split

    s = train_test_split(docs, "doc_id", train_frac=0.8)
    train = s.where(F.col("split") == "train").select("doc_id", "text")
    test = s.where(F.col("split") == "test").select("doc_id", "text")
    exact = sorted(
        (r.doc_id, r.n_hits, r.contaminated)
        for r in decontaminate(train, test, "doc_id", "text").collect()
    )
    bloom = sorted(
        (r.doc_id, r.n_hits, r.contaminated)
        for r in bloom_decontaminate(train, test, "doc_id", "text").collect()
    )
    assert bloom == exact and len(exact) > 0


def test_bloom_decontaminate_tiny_filter_still_exact(spark):
    """Saturate a 64-bit bitmap so nearly every probe is a false positive:
    the verify join must still discard them all."""
    train = _docs(spark, [(1, "alpha beta gamma delta"), (2, "p q r s t")])
    test = _docs(spark, [(9, "x alpha beta gamma y")])
    got = {r.id: (r.n_hits, r.contaminated) for r in
           bloom_decontaminate(train, test, "id", "text", m_bits=64).collect()}
    # train doc 1 shingles: {alpha beta gamma, beta gamma delta};
    # test shingles: {x alpha beta, alpha beta gamma, beta gamma y};
    # shared: {alpha beta gamma} -> n_hits == 1
    assert got[1] == (1, 1)
    assert got[2] == (0, 0)


def test_null_safe_join_pairs_null_keys(spark):
    left = spark.createDataFrame([(1, None), (2, "a"), (3, "b")], "id long, k string")
    right = spark.createDataFrame([(None, "NULLROW"), ("a", "A")], "k2 string, v string")
    got = {r.id: r.v for r in null_safe_join(left, right, "k", "k2").collect()}
    assert got == {1: "NULLROW", 2: "A"}
