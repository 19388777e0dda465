"""PII redaction, repetition stats, and quantized similarity — behavioral
invariants beyond the registry's oracle match."""

from __future__ import annotations

from pyspark.sql import functions as F

from hdp_tez_spark.extensions.similarity import (
    cosine_topk_bruteforce,
    cosine_topk_quantized,
    quantize_embeddings,
)
from hdp_tez_spark.extensions.textstats import redact_pii, repetition_stats
from hdp_tez_spark.sources.catalog import load_table
from tests.conftest import SF_SMOKE


def test_redact_pii_replaces_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a@b.com or c.d+x@e.org, call +1 (555) 123-4567"),
            (2, "server at 10.0.0.1 and 192.168.1.255 ok"),
            (3, "nothing sensitive here 12345"),
        ],
        "id long, text string",
    )
    got = {r.id: r for r in redact_pii(df, "id", "text").collect()}
    assert got[1].n_emails == 2 and got[1].n_phones == 1
    assert "<EMAIL>" in got[1].redacted and "<PHONE>" in got[1].redacted
    assert "a@b.com" not in got[1].redacted
    assert got[2].n_ips == 2 and got[2].redacted.count("<IP>") == 2
    # plain integers are NOT phone numbers (pattern needs a leading +/( )
    assert got[3] and (got[3].n_emails, got[3].n_ips, got[3].n_phones) == (0, 0, 0)
    assert got[3].redacted == "nothing sensitive here 12345"


def test_repetition_stats_bounds(spark):
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),
            (2, "all tokens here are different"),
            (3, ""),
        ],
        "id long, text string",
    )
    got = {r.id: r for r in repetition_stats(df, "id", "text").collect()}
    assert got[1].n_unique == 1 and got[1].rep_ratio == 0.75
    assert got[2].rep_ratio == 0.0
    assert got[3].n_tokens == 0 and got[3].rep_ratio == 0.0


def test_quantize_range_and_scale(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    q = quantize_embeddings(emb).select(
        F.array_max("qvec").alias("hi"),
        F.array_min("qvec").alias("lo"),
        "scale",
    )
    row = q.agg(
        F.max("hi").alias("hi"), F.min("lo").alias("lo"), F.min("scale").alias("s")
    ).collect()[0]
    assert row.hi <= 127 and row.lo >= -128
    assert row.s > 0


def test_quantized_topk_recall_vs_exact(spark):
    """int8 quantization keeps >= 80% of the exact top-5 neighbor sets at
    dim 64 (measured, not assumed — the docstring's recall claim)."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.where(F.col("vec_id") < 20)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk_bruteforce(queries, emb, k=5).collect()
    }
    quant = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk_quantized(queries, emb, k=5).collect()
    }
    assert len(exact) == len(quant) == 100
    recall = len(exact & quant) / len(exact)
    assert recall >= 0.8, f"quantized recall {recall}"


def test_bpe_merges_sennrich_example(spark):
    """The classic BPE walkthrough corpus: 'low'x3 + 'lower' + 'newest'x2.
    First rounds must learn l+o, lo+w (count 4 = 3 low + lower), then
    low+</w> (count 3), then the count-2 tie resolves to the
    lexicographically smallest pair 'e s'."""
    from hdp_tez_spark.extensions.textstats import bpe_merges

    df = spark.createDataFrame(
        [("low low low lower newest newest",)], "text string"
    )
    out = [tuple(r) for r in bpe_merges(df, "text", n_merges=4).collect()]
    assert out == [
        (1, "l", "o", "lo", 4),
        (2, "lo", "w", "low", 4),
        (3, "low", "</w>", "low</w>", 3),
        (4, "e", "s", "es", 2),
    ]


def test_bpe_apply_merge_textbook_adjacent_repeats(spark):
    """Textbook (Sennrich) greedy merge on repetitive text: 'aaaa'
    becomes [aa, aa, </w>], not the under-merged [aa, a, a, </w>] a
    single boundary-consuming replace() pass yields. Also the odd run:
    'aaaaa' -> [aa, aa, a, </w>] (leftmost-greedy, leftover last)."""
    from hdp_tez_spark.extensions.textstats import bpe_encode

    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "aaaaa"), (3, "abab")], "doc_id int, text string"
    )
    rows = {
        r["doc_id"]: r["tokens"]
        for r in bpe_encode(df, "doc_id", "text", [("a", "a")]).collect()
    }
    assert rows[1] == ["aa", "aa", "</w>"]
    assert rows[2] == ["aa", "aa", "a", "</w>"]
    assert rows[3] == ["a", "b", "a", "b", "</w>"]


def test_bpe_merges_learned_rules_compose(spark):
    """A word dominated by repetition merges all the way to a single
    symbol within len(word) rounds, and each round's merged symbol is
    the concatenation of the two sides."""
    from hdp_tez_spark.extensions.textstats import bpe_merges

    df = spark.createDataFrame([("abab abab abab",)], "text string")
    rows = bpe_merges(df, "text", n_merges=4).collect()
    for r in rows:
        assert r.merged == r.left + r.right
    # 'a b' is the most frequent pair (2 per word x 3 words = 6,
    # counting both occurrences inside each word)
    assert (rows[0].left, rows[0].right, rows[0].pair_count) == ("a", "b", 6)


def test_bpe_merges_rejects_bad_n(spark):
    import pytest

    from hdp_tez_spark.extensions.textstats import bpe_merges

    df = spark.createDataFrame([("x",)], "text string")
    with pytest.raises(ValueError):
        bpe_merges(df, "text", n_merges=0)


def test_bpe_encode_tokens_and_compression(spark):
    from hdp_tez_spark.extensions.textstats import bpe_encode, bpe_merges

    df = spark.createDataFrame(
        [(1, "low low low lower newest newest")], "doc_id int, text string"
    )
    rules = [
        (r.left, r.right)
        for r in bpe_merges(df, "text", n_merges=4).collect()
    ]
    out = bpe_encode(df, "doc_id", "text", rules).collect()[0]
    assert out.n_words == 6
    # 3x low</w> (1) + lower (low,e,r,</w> = 4) + 2x newest
    # (n,e,w,es,t,</w> = 6) = 3 + 4 + 12 = 19
    assert out.n_tokens == 19 == len(out.tokens)
    assert out.tokens[:3] == ["low</w>", "low</w>", "low</w>"]
    # decoding invariant: stripping markers reconstructs the text's words
    joined = "".join(out.tokens).replace("</w>", " ").strip()
    assert joined == "low low low lower newest newest"


def test_bpe_encode_zero_shuffle_plan(spark):
    from hdp_tez_spark.extensions.textstats import bpe_encode

    df = spark.createDataFrame([(1, "a b")], "doc_id int, text string")
    enc = bpe_encode(df, "doc_id", "text", [("a", "</w>")])
    plan = enc._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan  # pure map-side encoder


def test_bpe_merges_stops_when_exhausted(spark):
    """A corpus whose words fully merge before n_merges rounds returns
    only the learnable rules (the SQL oracle's coalesce guard makes the
    exhausted rounds the identity — same contract)."""
    from hdp_tez_spark.extensions.textstats import bpe_encode, bpe_merges

    df = spark.createDataFrame([(1, "ab ab")], "doc_id int, text string")
    rows = [tuple(r) for r in bpe_merges(df, "text", n_merges=6).collect()]
    assert rows == [(1, "a", "b", "ab", 2), (2, "ab", "</w>", "ab</w>", 2)]
    rules = [(r[1], r[2]) for r in rows]
    out = bpe_encode(df, "doc_id", "text", rules).collect()[0]
    assert (out.n_words, out.n_tokens) == (2, 2)
    assert out.tokens == ["ab</w>", "ab</w>"]
