"""Curation operators: decontamination, stratified sampling, sequence
packing, leakage-safe splits — behavioral invariants beyond the
registry's oracle match."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hdp_tez_spark.extensions.curation import (
    decontaminate,
    pack_sequences,
    stratified_sample_exact,
    stratified_sample_fraction,
)
from hdp_tez_spark.extensions.splits import cluster_split
from hdp_tez_spark.sources.catalog import load_table
from tests.conftest import SF_SMOKE


def test_decontaminate_flags_verbatim_overlap(spark):
    """A train doc containing a test doc's 3-gram is flagged; a disjoint
    doc is not."""
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated words appear here instead"),
        ],
        "id long, text string",
    )
    test = spark.createDataFrame(
        [(100, "watch the quick brown fox run")], "id long, text string"
    )
    got = {r.id: (r.n_hits, r.contaminated) for r in
           decontaminate(train, test, "id", "text").collect()}
    assert got[1][1] == 1 and got[1][0] >= 1  # shares "the quick brown"
    assert got[2] == (0, 0)
    # every train row present exactly once
    assert len(got) == 2


def test_decontaminate_counts_distinct_shared_ngrams(spark):
    """n_hits counts distinct shared shingles, not occurrences."""
    train = spark.createDataFrame(
        [(1, "a b c a b c a b c")], "id long, text string"
    )
    test = spark.createDataFrame([(9, "x a b c y")], "id long, text string")
    row = decontaminate(train, test, "id", "text").collect()[0]
    # train shingles (distinct): "a b c", "b c a", "c a b"; shared: "a b c"
    assert (row.n_hits, row.contaminated) == (1, 1)


def test_stratified_exact_counts_and_determinism(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    out = stratified_sample_exact(docs, "doc_id", "lang", 7)
    per = {r.lang: r.cnt for r in
           out.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    sizes = {r.lang: r.cnt for r in
             docs.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    for lang, n in per.items():
        assert n == min(7, sizes[lang])
    # repartitioning cannot change the picked set
    a = {r.doc_id for r in out.collect()}
    b = {r.doc_id for r in
         stratified_sample_exact(docs.repartition(13), "doc_id", "lang", 7)
         .collect()}
    assert a == b
    with pytest.raises(ValueError):
        stratified_sample_exact(docs, "doc_id", "lang", 0)


def test_stratified_fraction_is_subset_and_map_side(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    full = stratified_sample_fraction(docs, "doc_id", "lang", {"en": 1.0})
    # frac=1.0 keeps every row of the stratum
    assert full.count() == docs.where(F.col("lang") == "en").count()
    half = stratified_sample_fraction(
        docs, "doc_id", "lang", {"en": 0.5}, default_frac=0.0
    )
    # kept set at 0.5 is a subset of the 1.0 set (nested samples: growing
    # the fraction only adds rows — the property incremental re-mixes rely on)
    assert half.join(full, "doc_id", "left_anti").count() == 0
    # map-side only: no exchange in the plan
    plan = half._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    with pytest.raises(ValueError):
        stratified_sample_fraction(docs, "doc_id", "lang", {"en": 1.5})


def test_pack_sequences_layout_invariants(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    from hdp_tez_spark.extensions.textstats import token_stats

    toks = token_stats(docs, "doc_id", "text").select("doc_id", "n_tokens")
    budget = 128
    out = pack_sequences(toks, "doc_id", "n_tokens", budget, num_buckets=4)
    rows = out.collect()
    assert len(rows) == toks.count()  # every doc assigned exactly once
    assert all(0 <= r.pack_offset < budget for r in rows)
    assert all(r.pack_idx >= 0 for r in rows)
    # within a bucket, offsets reconstruct the concat layout exactly:
    # sorting docs by (pack_idx, pack_offset) gives contiguous token spans
    by_bucket: dict[int, list] = {}
    for r in rows:
        by_bucket.setdefault(r.bucket, []).append(r)
    for bucket_rows in by_bucket.values():
        bucket_rows.sort(key=lambda r: (r.pack_idx, r.pack_offset))
        pos = 0
        for r in bucket_rows:
            assert r.pack_idx * budget + r.pack_offset == pos
            pos += r.n_tokens
    with pytest.raises(ValueError):
        pack_sequences(toks, "doc_id", "n_tokens", 0)


def test_pack_sequences_deterministic_across_partitioning(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    from hdp_tez_spark.extensions.textstats import token_stats

    toks = token_stats(docs, "doc_id", "text").select("doc_id", "n_tokens")
    a = {(r.doc_id, r.bucket, r.pack_idx, r.pack_offset)
         for r in pack_sequences(toks, "doc_id", "n_tokens", 256).collect()}
    b = {(r.doc_id, r.bucket, r.pack_idx, r.pack_offset)
         for r in pack_sequences(
             toks.repartition(11), "doc_id", "n_tokens", 256).collect()}
    assert a == b


def test_cluster_split_no_leakage(spark):
    """Every near-dup cluster lands entirely in one split."""
    docs = load_table(spark, SF_SMOKE, "documents")
    out = cluster_split(docs, "doc_id", "text", threshold=0.1)
    straddling = (
        out.groupBy("rep")
        .agg(F.countDistinct("split").alias("nsplits"))
        .where(F.col("nsplits") > 1)
        .count()
    )
    assert straddling == 0
    assert out.count() == docs.count()
    # both splits are non-empty at the default 90/10
    assert out.select("split").distinct().count() == 2


def test_incremental_near_dupes_scopes_pairs(spark):
    """new_old and new_new pairs are reported; corpus-internal dups are
    NOT (the whole point: the corpus is never re-paired with itself)."""
    from hdp_tez_spark.extensions.dedup import incremental_near_dupes

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    corpus = spark.createDataFrame(
        [(1, base), (2, base + " extra"), (3, "totally different words here now")],
        "id long, text string",
    )
    batch = spark.createDataFrame(
        [(101, base + " tail"), (102, base + " tail two"), (103, "nothing shared")],
        "id long, text string",
    )
    out = incremental_near_dupes(batch, corpus, "id", "text", threshold=0.3)
    pairs = {(r.id_a, r.id_b): r.pair_type for r in out.collect()}
    # batch doc 101 is a near-dup of corpus docs 1 and 2
    assert pairs.get((101, 1)) == "new_old"
    assert pairs.get((101, 2)) == "new_old"
    # within-batch pair, id_a < id_b
    assert pairs.get((101, 102)) == "new_new"
    # corpus pair (1,2) never appears in any orientation
    assert (1, 2) not in pairs and (2, 1) not in pairs
    # unrelated batch doc appears in no pair
    assert not any(103 in p for p in pairs)


def test_label_centroids_exact_mean(spark):
    from hdp_tez_spark.extensions.similarity import label_centroids

    df = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0]), (0, [3.0, 4.0, 5.0]), (1, [10.0, 0.0, -2.0])],
        "label int, embedding array<float>",
    )
    rows = {r.label: r for r in label_centroids(df).collect()}
    assert rows[0].n_vectors == 2 and rows[0].centroid == [2.0, 3.0, 4.0]
    assert rows[1].n_vectors == 1 and rows[1].centroid == [10.0, 0.0, -2.0]


def test_label_centroids_partition_invariant(spark):
    from hdp_tez_spark.extensions.similarity import label_centroids
    from hdp_tez_spark.sources.catalog import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    a = {r.label: tuple(r.centroid) for r in label_centroids(emb).collect()}
    b = {r.label: tuple(r.centroid)
         for r in label_centroids(emb.repartition(17)).collect()}
    assert a == b


def test_kmeans_assigns_nearest_and_converges(spark):
    from hdp_tez_spark.extensions.similarity import (
        assign_cells,
        cosine,
        kmeans_fit,
    )
    from hdp_tez_spark.sources.catalog import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    cents = kmeans_fit(emb, k=4, max_iter=5)
    assert len(cents) == 4
    out = assign_cells(emb, cents)
    # every row got a cell from the trained set
    cells = {c for c, _ in cents}
    assert {r.cell for r in out.select("cell").distinct().collect()} <= cells
    # spot-check: the assigned cell maximizes rounded cosine (ties -> min cid)
    rows = out.limit(20).collect()
    import math

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(dot / (na * nb), 6)

    for r in rows:
        scored = sorted(
            ((cos([float(x) for x in r.embedding], v), -cid) for cid, v in cents),
            reverse=True,
        )
        assert -scored[0][1] == r.cell


def test_kmeans_deterministic(spark):
    from hdp_tez_spark.extensions.similarity import kmeans_fit
    from hdp_tez_spark.sources.catalog import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    a = kmeans_fit(emb, k=4, max_iter=3)
    b = kmeans_fit(emb.repartition(9), k=4, max_iter=3)
    assert a == b


def test_numeric_histogram_invariants(spark):
    from hdp_tez_spark.operators.aggregates import numeric_histogram
    from hdp_tez_spark.sources.catalog import load_table

    li = load_table(spark, SF_SMOKE, "lineitem")
    out = numeric_histogram(li, "l_extendedprice", 10).collect()
    assert sum(r.cnt for r in out) == li.count()  # every row binned once
    assert all(0 <= r.bin < 10 for r in out)
    # bins tile [lo, hi]: consecutive edges meet
    srt = sorted(out, key=lambda r: r.bin)
    for prev, nxt in zip(srt, srt[1:]):
        if nxt.bin == prev.bin + 1:
            assert abs(prev.bin_hi - nxt.bin_lo) < 1e-6
    import pytest as _pytest

    with _pytest.raises(ValueError):
        numeric_histogram(li, "l_extendedprice", 0)


def test_curate_corpus_end_to_end(spark):
    """The composed flow holds its invariants: dedup kept one doc per
    cluster, the split is leakage-safe, the packed set is exactly the
    decontaminated train set."""
    from hdp_tez_spark.extensions.curation import curate_corpus, decontaminate

    docs = load_table(spark, SF_SMOKE, "documents")
    out = curate_corpus(
        docs, "doc_id", "text", near_dup_threshold=0.1, min_quality=0.2,
        pack_budget=256,
    )
    kept = out["kept"]
    # one survivor per cluster, all above the quality bar
    assert kept.groupBy("cluster_rep").count().where(F.col("count") > 1).count() == 0
    assert kept.where(F.col("quality") < 0.2).count() == 0
    # split covers kept exactly, and no cluster straddles it
    train_n, test_n = out["train"].count(), out["test"].count()
    assert train_n + test_n == kept.count()
    # every packed doc is a clean train doc (decontaminated, deduped)
    clean = decontaminate(out["train"], out["test"], "doc_id", "text").where(
        F.col("contaminated") == 0
    )
    assert out["packed"].count() == clean.count()
    assert (
        out["packed"].join(out["train"].select("doc_id"), "doc_id", "left_anti")
        .count() == 0
    )


def test_kfold_split_deterministic_and_complete(spark):
    from hdp_tez_spark.extensions.splits import kfold_split

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id")
    a = {r.doc_id: r.fold for r in kfold_split(docs, "doc_id", k=5).collect()}
    b = {
        r.doc_id: r.fold
        for r in kfold_split(docs.repartition(7), "doc_id", k=5).collect()
    }
    assert a == b  # partitioning-independent assignment
    assert set(a.values()) <= set(range(5))
    # every fold populated and no fold hogs the data (hash balance)
    from collections import Counter

    c = Counter(a.values())
    assert len(c) == 5
    assert max(c.values()) < 2 * min(c.values())


def test_entity_resolution_composition_consistency(spark):
    """The composed ER pipeline (pairs -> components -> golden record)
    agrees with its stages: every cluster representative is the min id
    of its members, member counts sum to the corpus size, and each
    cluster's surviving attributes come from its best member."""
    import __spark_entry__ as E
    from tests.conftest import SF_SMOKE

    out = E.queries()["entity_resolution"](spark, SF_SMOKE).collect()
    n_docs = load_table(spark, SF_SMOKE, "documents").count()
    assert sum(r["n_members"] for r in out) == n_docs
    clusters = [r["cluster"] for r in out]
    assert len(clusters) == len(set(clusters))  # one golden row per entity
    assert any(r["n_members"] > 1 for r in out)  # non-vacuous: real merges


def test_mixture_weights_realizes_target(spark):
    from hdp_tez_spark.extensions.curation import mixture_weights

    df = spark.createDataFrame(
        [("web", 100), ("web", 300), ("books", 50), ("code", None)],
        "domain string, toks int",
    )
    out = {
        r.domain: r
        for r in mixture_weights(
            df, "domain", "toks", {"web": 1.0, "books": 1.0}, 200
        ).collect()
    }
    assert set(out) == {"web", "books", "code"}
    web, books, code = out["web"], out["books"], out["code"]
    assert (web.docs, web.tokens) == (2, 400)
    # desired 100 of 400 available -> rate 0.25, epochs 0.25
    assert web.sample_rate == web.epochs == 0.25
    # desired 100 of 50 available -> rate clips at 1, epochs 2 (upsample)
    assert (books.sample_rate, books.epochs) == (1.0, 2.0)
    # unlisted domain: zero share; NULL tokens sum to 0 -> NULL ratios
    assert code.tokens == 0 and code.target_share == 0.0
    assert code.sample_rate is None and code.epochs is None
    assert web.corpus_share == round(400 / 450, 6)


def test_mixture_weights_validates(spark):
    from hdp_tez_spark.extensions.curation import mixture_weights

    df = spark.createDataFrame([("a", 1)], "domain string, toks int")
    with pytest.raises(ValueError):
        mixture_weights(df, "domain", "toks", {}, 100)
    with pytest.raises(ValueError):
        mixture_weights(df, "domain", "toks", {"a": 1.0}, 0)
    with pytest.raises(ValueError):
        mixture_weights(df, "domain", "toks", {"a": -1.0}, 100)


def test_importance_sample_prefers_high_scores(spark):
    from hdp_tez_spark.extensions.curation import importance_sample

    rows = [(i, 1.0) for i in range(400)] + [(i, 100.0) for i in range(400, 500)]
    df = spark.createDataFrame(rows, "id long, score double")
    kept = importance_sample(
        df, "id", "score", temperature=1.0, keep_frac=0.2
    ).collect()
    hi = [r for r in kept if r.id >= 400]
    lo = [r for r in kept if r.id < 400]
    # per-row p: lo = 0.2*500*1/10400 ~ 0.0096, hi ~ 0.9615 — nearly all
    # high-score rows survive, almost no low-score rows do
    assert len(hi) > 80 and len(lo) < 20
    for r in kept:
        assert 0 < r.p_keep <= 1
        assert r.ess_weight == round(1.0 / r.p_keep, 6)


def test_importance_sample_deterministic_and_validates(spark):
    from hdp_tez_spark.extensions.curation import importance_sample

    df = spark.createDataFrame(
        [(i, float(i % 7 + 1)) for i in range(300)], "id long, score double"
    ).repartition(7)
    a = sorted(
        r.id
        for r in importance_sample(df, "id", "score", 2.0, 0.3).collect()
    )
    b = sorted(
        r.id
        for r in importance_sample(
            df.repartition(2), "id", "score", 2.0, 0.3
        ).collect()
    )
    assert a == b and a
    with pytest.raises(ValueError):
        importance_sample(df, "id", "score", temperature=0.0)
    with pytest.raises(ValueError):
        importance_sample(df, "id", "score", keep_frac=0.0)
    with pytest.raises(ValueError):
        importance_sample(df, "id", "score", keep_frac=1.5)


def test_apply_mixture_executes_planned_rates(spark):
    from hdp_tez_spark.extensions.curation import apply_mixture, mixture_weights

    rows = [(i, "web" if i < 400 else "books", 10) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, dom string, toks int")
    target = {"web": 1.0, "books": 1.0}
    kept = apply_mixture(df, "dom", "toks", "id", target, 4000).collect()
    by_dom = {}
    for r in kept:
        by_dom.setdefault(r.dom, []).append(r)
    # books: desired 2000 of 1000 available -> rate 1.0, all 100 kept,
    # epochs 2.0 rides every kept row
    assert len(by_dom["books"]) == 100
    assert all(r.epochs == 2.0 and r.sample_rate == 1.0 for r in by_dom["books"])
    # web: desired 2000 of 4000 -> rate 0.5; hash-filtered near half
    n_web = len(by_dom["web"])
    assert 140 <= n_web <= 260, n_web
    assert all(r.sample_rate == 0.5 for r in by_dom["web"])
    # deterministic across repartitioning
    again = sorted(
        r.id
        for r in apply_mixture(
            df.repartition(7), "dom", "toks", "id", target, 4000
        ).collect()
    )
    assert again == sorted(r.id for r in kept)
    # zero-share domain drops entirely
    only_web = apply_mixture(df, "dom", "toks", "id", {"web": 1.0}, 4000)
    assert {r.dom for r in only_web.collect()} == {"web"}


def test_ngram_novelty_counts_cross_doc_sharing(spark):
    from hdp_tez_spark.extensions.dedup import ngram_novelty

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),   # shares 'the quick brown'
            (2, "the quick brown cat sleeps"),  # with doc 1
            (3, "completely different words here"),
        ],
        "id long, text string",
    )
    out = {r.id: r for r in ngram_novelty(df, "id", "text", k=3).collect()}
    # doc1: shingles {tqb, qbf, bfj} — tqb shared with doc2 -> 2/3 unique
    assert out[1].n_shingles == 3 and out[1].n_unique == 2
    assert out[1].novelty == round(2 / 3, 6)
    assert out[2].n_shingles == 3 and out[2].n_unique == 2
    # doc3 shares nothing
    assert out[3].novelty == 1.0
    # short doc (< k tokens) collapses to one whole-text shingle
    short = spark.createDataFrame([(9, "hi there"), (10, "hi there")],
                                  "id long, text string")
    s = {r.id: r for r in ngram_novelty(short, "id", "text").collect()}
    assert s[9].n_shingles == 1 and s[9].n_unique == 0 and s[9].novelty == 0.0
    # NULL text contributes no shingles but keeps its output row
    withnull = spark.createDataFrame(
        [(20, "alpha beta gamma delta"), (21, None)], "id long, text string"
    )
    n = {r.id: r for r in ngram_novelty(withnull, "id", "text").collect()}
    assert n[21].n_shingles == 0 and n[21].novelty is None
    assert n[20].novelty == 1.0


def test_importance_sample_floors_propensity(spark):
    """A stratum whose true keep probability quantizes to 0.0000 must
    stay reachable (floored to 0.0001) with bounded IPW weight — the
    r05 review finding: silent zero-probability exclusion is a biased
    sample, not a downweighted one."""
    from hdp_tez_spark.extensions.curation import importance_sample

    rows = [(i, 1.0) for i in range(1000)] + [(1000 + i, 1e9) for i in range(5)]
    df = spark.createDataFrame(rows, "id long, score double")
    kept = importance_sample(
        df, "id", "score", temperature=1.0, keep_frac=0.1
    ).collect()
    # every low-score row's p would be ~1e-8 unfloored -> must be 0.0001
    # with the IPW weight capped at exactly 10^4
    for r in kept:
        if r.id < 1000:
            assert r.p_keep == 0.0001 and r.ess_weight == 10000.0
    # the whales clip at 1 and are all kept
    kept_hi = [r for r in kept if r.id >= 1000]
    assert len(kept_hi) == 5 and all(r.p_keep == 1.0 for r in kept_hi)
