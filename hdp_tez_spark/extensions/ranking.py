"""Corpus ranking / retrieval operators: TF-IDF, BM25, inverted index,
and exact heavy hitters with bounded-memory candidate generation.

Beyond-reference extension (the reference engine has no expression layer
at all — SURVEY §2.8; Hive-on-Tez supplies ranking in SQL). These are the
retrieval-side operators a training-data pipeline runs for quality
filtering (rank documents against seed queries), corpus search, and
vocabulary pruning.

Shared design rules (same as dedup.py / curation.py):
- term statistics are built with ordinary groupBy aggregations so the
  map-side combiner halves shuffle volume (a term occurring 1M times in
  a partition shuffles one row, not 1M);
- document-frequency tables are value-keyed aggregates over the token
  stream whose size is |vocabulary|, not |corpus| — they broadcast
  under AQE without hints;
- scalar corpus statistics (N, avgdl) ride along as 1-row cross joins,
  never driver-side collects;
- nothing is quadratic and no document body is ever shuffled — only
  tokens and 8-byte counts.
"""

from __future__ import annotations

import math
from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hdp_tez_spark.functions.text import tokenize
from hdp_tez_spark.parallel import spread as _spread


def _doc_terms(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, term, tf) — term frequency per document. One explode + one
    partially-aggregated groupBy; shuffle carries (id, term, count)."""
    return (
        _spread(df.select(id_col, text_col))
        .select(F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def tfidf_top_terms(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
) -> DataFrame:
    """Top-k characteristic terms per document by smoothed TF-IDF
    (idf = ln((N+1)/(df+1)) + 1, the sklearn-style smooth variant so
    corpus-universal terms still get positive weight).

    Output: (id, term, tf, df, score) with score rounded to 6 dp and
    ties broken by term asc — fully deterministic.

    Scale: df table is |vocab| rows (AQE-broadcastable); the only
    per-corpus shuffles are the (id, term) partial-agg and the final
    per-document top-k window, which partitions by document id — no
    skew beyond document length, no global funnel.
    """
    terms = _doc_terms(df, id_col, text_col)
    doc_freq = terms.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(
        F.count_distinct(F.col(id_col)).alias("__n")
    )  # 1 row, cross-joined — never collected
    scored = (
        terms.join(doc_freq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf")
                * (F.log((F.col("__n") + 1) / (F.col("df") + 1)) + 1),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("score"), F.asc("term")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
    )


def bm25_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    limit: int = 20,
) -> DataFrame:
    """Rank documents against a bag-of-words query with BM25
    (Robertson/Sparck Jones idf = ln(1 + (N - df + 0.5)/(df + 0.5))).

    Output: (id, score) — top `limit` by score desc, id asc, score
    rounded to 6 dp.

    Scale: the tf table is filtered to query terms BEFORE the join
    (predicate pushdown keeps the term join tiny); doc length comes
    from a separate |docs|-row aggregate; N/avgdl are 1-row cross
    joins. Total shuffle = |docs with a query term| + |docs|, and the
    final top-k compiles to TakeOrderedAndProject (no global sort).
    """
    qlit = [t.lower() for t in query_terms]
    terms = _doc_terms(df, id_col, text_col).where(F.col("term").isin(qlit))
    doc_len = (
        _spread(df.select(id_col, text_col))
        .select(F.col(id_col), F.size(tokenize(F.col(text_col))).alias("dl"))
    )
    stats = doc_len.select(
        F.count(F.lit(1)).alias("__n"), F.avg("dl").alias("__avgdl")
    )
    doc_freq = terms.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    contrib = (
        terms.join(doc_freq, "term")
        .join(doc_len, id_col)
        .crossJoin(F.broadcast(stats))
        .select(
            F.col(id_col),
            (
                F.log(
                    1
                    + (F.col("__n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                )
                * (F.col("tf") * (k1 + 1))
                / (
                    F.col("tf")
                    + k1 * (1 - b + b * F.col("dl") / F.col("__avgdl"))
                )
            ).alias("__c"),
        )
    )
    return (
        contrib.groupBy(id_col)
        .agg(F.round(F.sum("__c"), 6).alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(limit)
    )


def inverted_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_df: int = 1,
    max_df: int | None = None,
) -> DataFrame:
    """Term -> posting-list index: (term, df, postings) where postings is
    the comma-joined sorted document-id list (serialized — array cells
    defeat external comparators and most sinks' predicate pushdown).

    min_df/max_df prune singleton noise and stopword-class terms whose
    posting lists would be corpus-sized; at 100 TB you always set
    max_df (a term appearing in every document yields a |corpus|-long
    list in ONE group — cap it or aggregate counts only).

    Scale: distinct (term, id) pairs shuffle once on term; sort_array
    on the grouped list is per-group. Skew = df of the most common
    surviving term, which max_df bounds by construction.
    """
    pairs = (
        _spread(df.select(id_col, text_col))
        .select(F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("term"))
        .distinct()
    )
    idx = pairs.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.concat_ws(
            ",", F.sort_array(F.collect_list(F.col(id_col).cast("string")))
        ).alias("postings"),
    )
    cond = F.col("df") >= min_df
    if max_df is not None:
        cond = cond & (F.col("df") <= max_df)
    return idx.where(cond)


_MG_SCHEMA = "term string"


def _misra_gries_partition(
    batches: Iterator[pd.DataFrame], capacity: int
) -> Iterator[pd.DataFrame]:
    """Misra-Gries frequent-items summary over one partition's tokens.
    Guarantee: any term with partition count > n_p/(capacity+1) survives,
    so any GLOBAL heavy hitter (count >= n/denom, denom <= capacity) is
    emitted by at least one partition (averaging argument)."""
    counters: dict[str, int] = {}
    for pdf in batches:
        for term in pdf["term"]:
            if term in counters:
                counters[term] += 1
            elif len(counters) < capacity:
                counters[term] = 1
            else:
                dead = []
                for key in counters:
                    counters[key] -= 1
                    if counters[key] == 0:
                        dead.append(key)
                for key in dead:
                    del counters[key]
    yield pd.DataFrame({"term": list(counters.keys())})


def heavy_hitters(
    df: DataFrame,
    id_col: str,
    text_col: str,
    denom: int = 200,
) -> DataFrame:
    """EXACT heavy hitters: terms occurring >= total_tokens/denom times,
    with exact counts — via per-partition Misra-Gries candidate
    generation (bounded memory, no shuffle) + exact recount of the
    candidate set only.

    Output: (term, cnt), terms with cnt * denom >= total.

    Scale rationale: a naive groupBy shuffles one row per DISTINCT term
    — at 100 TB the long tail (urls, ids, typos) dominates shuffle
    volume while contributing nothing. Misra-Gries holds <= denom
    counters per partition, emits <= denom candidates each, and its
    superset guarantee makes the final recount exact: the candidate
    semi-join discards the tail BEFORE the shuffle, so shuffle volume
    is |candidates| * |partitions| at worst. The threshold compare is
    pure integer arithmetic (cnt * denom >= total) — no float
    boundary, bit-stable in any engine.
    """
    # r11: the regex tokenizer ran once per consumer (Misra-Gries pass,
    # candidate recount, total count — 3 corpus tokenizations). Cut the
    # per-row token ARRAYS once (text-sized, not exploded; same
    # eager-at-construction contract as the dedup cuts) and derive all
    # three consumers from the cut: explodes are cheap, the regex split
    # is the map cost, and the total is a map-side sum of array sizes
    # (equal to the exploded row count — tokenize already drops empties).
    from hdp_tez_spark.plans.checkpoints import truncate_lineage

    arr = truncate_lineage(
        _spread(df.select(text_col)).select(
            tokenize(F.col(text_col)).alias("__tk")
        )
    )
    toks = arr.select(F.explode("__tk").alias("term"))
    cand = (
        toks.mapInPandas(
            lambda it: _misra_gries_partition(it, denom), schema=_MG_SCHEMA
        )
        .distinct()
    )
    counted = (
        toks.join(F.broadcast(cand), "term")  # candidates bounded by
        # denom * n_partitions — broadcast-safe by construction
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    total = arr.select(
        F.coalesce(F.sum(F.size("__tk")), F.lit(0)).alias("__total")
    )
    return (
        counted.crossJoin(F.broadcast(total))
        .where(F.col("cnt") * denom >= F.col("__total"))
        .select("term", "cnt")
    )


def rrf_fuse(
    rankings: dict[str, DataFrame],
    id_col: str,
    score_col: str = "score",
    query_col: str | None = None,
    k: int = 60,
    limit: int = 20,
) -> DataFrame:
    """Reciprocal-rank fusion of N retriever outputs — the standard way
    to combine a lexical ranking (BM25) with a vector ranking (cosine
    ANN) or any other prior without score calibration:
    rrf(d) = sum over lists of 1 / (k + rank_list(d)).

    Input: named DataFrames of (id, score [, query]) candidate lists —
    the TOP-k output of each retriever, not full corpora. Output:
    ([query,] id, rrf, n_lists) — top `limit` by fused score desc, id
    asc, rrf rounded to 6 dp; n_lists counts how many retrievers
    surfaced the id. Ranks are dense row_numbers per list (score desc,
    id asc), so fusion is fully deterministic.

    Scale shape: each input is already a bounded candidate list (its
    retriever's top-k), so the rank window runs over <= k rows per
    query — partitioned by `query_col` when fusing many queries at
    once (the batch-retrieval shape), single tiny partition otherwise.
    The union + groupBy shuffles only |lists| x k candidate rows per
    query; corpus-sized data never reaches this operator.
    """
    if not rankings:
        raise ValueError("rankings must be non-empty")
    keys = ([query_col] if query_col else []) + [id_col]
    parts = []
    for name, rdf in rankings.items():
        w = (
            Window.partitionBy(query_col) if query_col else Window.partitionBy()
        ).orderBy(F.desc(score_col), F.asc(id_col))
        parts.append(
            rdf.select(*keys, F.row_number().over(w).alias("__rank"))
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    w_out = (
        Window.partitionBy(query_col) if query_col else Window.partitionBy()
    ).orderBy(F.desc("rrf"), F.asc(id_col))
    return (
        u.groupBy(*[F.col(c) for c in keys])
        .agg(
            F.round(F.sum(1.0 / (F.lit(k) + F.col("__rank"))), 6).alias("rrf"),
            F.count(F.lit(1)).alias("n_lists"),
        )
        .withColumn("__rn", F.row_number().over(w_out))
        .where(F.col("__rn") <= limit)
        .drop("__rn")
    )


def ndcg_eval(
    ranked: DataFrame,
    labels: DataFrame,
    query_col: str,
    id_col: str,
    rel_col: str,
    score_col: str = "score",
    rank_col: str | None = None,
    k: int = 10,
) -> DataFrame:
    """NDCG@k ranking-quality evaluation — the standard graded-relevance
    acceptance metric for any retriever this module builds (BM25, TF-IDF,
    the ANN family): per query,

        DCG@k  = Σ_{pos<=k} rel(doc at pos) / log2(pos + 1)
        IDCG@k = the same sum over the query's OWN labels sorted rel
                 DESC (the best achievable ordering)
        NDCG   = DCG / IDCG            (Järvelin & Kekäläinen '02)

    `ranked` is a retriever's candidate output (query, id, score[, rank]);
    `labels` is the judgment set (query, id, rel >= 0). Positions come
    from `rank_col` when the retriever already emits deterministic ranks
    (use it — re-ranking a ROUNDED score here could disagree with the
    retriever's own unrounded tie-breaks), else row_number over
    (score DESC, id ASC). Unjudged ranked docs count rel=0; judged but
    unranked docs only shape IDCG. Output per query:
    (query, dcg, idcg, ndcg) rounded to 6 dp, NDCG NULL when the query
    has no positive labels, ordered by query.

    Scale shape: both windows partition by query over CANDIDATE-sized
    input (retriever top-k and the judgment set — never the corpus);
    the rest is two |queries|-row grouped aggregations and one join.
    """
    if rank_col is None:
        w = Window.partitionBy(query_col).orderBy(F.desc(score_col), F.asc(id_col))
        pos = ranked.withColumn("__pos", F.row_number().over(w))
    else:
        pos = ranked.withColumn("__pos", F.col(rank_col).cast("long"))
    rel = F.coalesce(F.col(rel_col).cast("double"), F.lit(0.0))
    dcg = (
        pos.where(F.col("__pos") <= k)
        .join(labels, [query_col, id_col], "left")
        .groupBy(query_col)
        .agg(F.sum(rel / F.log2(F.col("__pos") + 1)).alias("__dcg"))
    )
    wi = Window.partitionBy(query_col).orderBy(
        F.col(rel_col).desc(), F.col(id_col).asc()
    )
    idcg = (
        labels.where(F.col(rel_col) > 0)
        .withColumn("__ipos", F.row_number().over(wi))
        .where(F.col("__ipos") <= k)
        .groupBy(query_col)
        .agg(
            F.sum(
                F.col(rel_col).cast("double") / F.log2(F.col("__ipos") + 1)
            ).alias("__idcg")
        )
    )
    return (
        dcg.join(idcg, query_col, "left")
        .select(
            query_col,
            F.round("__dcg", 6).alias("dcg"),
            F.round("__idcg", 6).alias("idcg"),
            F.round(F.col("__dcg") / F.col("__idcg"), 6).alias("ndcg"),
        )
        .orderBy(query_col)
    )


def zipf_fit(
    df: DataFrame,
    text_col: str,
    min_count: int = 1,
) -> DataFrame:
    """Zipf power-law fit of the corpus rank-frequency curve: OLS of
    ln(count) on ln(rank) over the vocabulary (natural text slopes near
    -1; Zipf '49, Piantadosi '14 review). The single-number corpus
    health audit next to lm_score/quality_score: a synthetic or
    template-heavy corpus bends the curve (|slope| falls, r2 drops), a
    boilerplate-flooded one steepens the head — both invisible to
    per-document stats. Output: ONE row (n_types, n_tokens, slope,
    intercept, r2) rounded to 6 dp; slope/intercept/r2 NULL for
    degenerate vocabularies (< 2 types, or all counts equal so the fit
    is vertical-free but varianceless). `min_count` drops the hapax
    tail (standard before fitting — the tail is measurement noise and
    at 100 TB it is also most of the vocabulary).

    Scale shape: the corpus collapses once to the |vocab|-row count
    table (map-side combine); the global rank uses the engine's
    distributed range-partition + per-partition rank + broadcast-offset
    machinery (`operators/sort.global_sort_ranked`) — NEVER a
    single-task global window; the fit itself is one aggregation of six
    OLS sufficient statistics over ln-transformed columns. (cnt DESC,
    term ASC) is a total order, so ranks are deterministic everywhere.
    """
    from hdp_tez_spark.operators.sort import global_sort_ranked

    counts = (
        _spread(df.select(text_col))
        .select(F.explode(tokenize(F.col(text_col))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= min_count)
    )
    ranked = global_sort_ranked(
        counts, [F.desc("cnt"), F.asc("term")], "rank"
    )
    x = F.log(F.col("rank").cast("double"))
    y = F.log(F.col("cnt").cast("double"))
    s = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("cnt")).alias("n_tokens"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    n = F.col("n").cast("double")
    cov_n = n * F.col("sxy") - F.col("sx") * F.col("sy")
    varx_n = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vary_n = n * F.col("syy") - F.col("sy") * F.col("sy")
    ok = (F.col("n") >= 2) & (varx_n > 0)
    # when()-guarded so no division EVALUATES on a degenerate
    # vocabulary (ANSI mode throws on division by zero; an empty
    # count table yields the n=0 aggregate row)
    slope = F.when(ok, cov_n / varx_n)
    return s.select(
        F.col("n").alias("n_types"),
        "n_tokens",
        F.round(slope, 6).alias("slope"),
        F.round(
            F.when(ok, (F.col("sy") - slope * F.col("sx")) / n), 6
        ).alias("intercept"),
        F.round(
            F.when(ok & (vary_n > 0), cov_n * cov_n / (varx_n * vary_n)), 6
        ).alias("r2"),
    )


#: default stopword list for rake_keywords — deliberately tiny and
#: embedded (not a language pack): RAKE's quality depends on the list
#: matching the corpus register, so real deployments pass their own.
RAKE_STOPWORDS = (
    "a", "an", "and", "as", "at", "be", "by", "for", "in", "is", "it",
    "of", "on", "or", "the", "to", "with",
)


def rake_keywords(
    df: DataFrame,
    id_col: str,
    text_col: str,
    stopwords: Sequence[str] | None = None,
    top_n: int = 20,
    max_phrase_len: int = 4,
) -> DataFrame:
    """RAKE keyword extraction (Rose et al. '10): candidate phrases are
    maximal runs of consecutive NON-stopword tokens within a document;
    each word scores deg(w)/freq(w) over the whole corpus (freq = how
    often w appears in candidates, deg = the summed length of every
    candidate containing it — words that travel in long phrases score
    high), and a phrase scores the sum of its words' scores. The
    corpus-level keyword audit next to tfidf_top_terms' per-doc view.
    Output: the global top_n distinct phrases (phrase, n, score) —
    n = occurrence count, score rounded to 6 dp, ranked by
    (rounded score DESC, phrase) so the selection boundary never races
    an unrounded float. Runs longer than `max_phrase_len` are dropped
    (RAKE convention — they are boilerplate, and their length would
    dominate deg).

    Scale shape: phrase building is the gaps-islands anchor (pos minus
    a per-doc row_number — one window partitioned BY DOC, never
    global); word stats are a vocabulary-sized partial-aggregated
    table; scoring is one equi-join back; selection is
    TakeOrderedAndProject. Nothing is ever all-pairs or corpus-sorted.
    """
    stop = list(stopwords) if stopwords is not None else list(RAKE_STOPWORDS)
    toks = (
        _spread(df.select(id_col, text_col))
        .select(
            F.col(id_col).alias("__doc"),
            F.posexplode(tokenize(F.col(text_col))).alias("__pos", "__term"),
        )
        .where(~F.col("__term").isin(stop))
    )
    island = F.col("__pos") - F.row_number().over(
        Window.partitionBy("__doc").orderBy("__pos")
    )
    words = toks.withColumn("__isl", island)
    phrases = (
        words.groupBy("__doc", "__isl")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__pos", "__term"))),
                    lambda s: s["__term"],
                ),
                " ",
            ).alias("phrase"),
            F.count(F.lit(1)).alias("__plen"),
        )
        .where(F.col("__plen") <= max_phrase_len)
    )
    occ = words.join(phrases, ["__doc", "__isl"])
    wstats = occ.groupBy("__term").agg(
        F.count(F.lit(1)).alias("__freq"),
        F.sum("__plen").alias("__deg"),
    )
    scored = (
        occ.join(wstats, "__term")
        .groupBy("__doc", "__isl", "phrase")
        .agg(
            F.sum(
                F.col("__deg").cast("double") / F.col("__freq").cast("double")
            ).alias("__score")
        )
    )
    return (
        scored.groupBy("phrase")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.max("__score"), 6).alias("score"),
        )
        .orderBy(F.desc("score"), "phrase")
        .limit(top_n)
    )


def ranking_eval(
    ranked: DataFrame,
    labels: DataFrame,
    query_col: str,
    id_col: str,
    rel_col: str,
    score_col: str = "score",
    rank_col: str | None = None,
    k: int = 10,
) -> DataFrame:
    """Binary-relevance ranking evaluation — the set-based companion to
    `ndcg_eval`, covering the other four standard IR acceptance
    metrics in one pass. Per query over the top-k ranked candidates:

        P@k  = |relevant in top k| / k
        R@k  = |relevant in top k| / |relevant judged|
        AP@k = (Σ_{rel pos p <= k} P@p) / min(|relevant|, k)
        RR@k = 1 / rank of the FIRST relevant result  (0 if none)

    MAP / MRR are the means of ap_at_k / rr_at_k across queries — left
    per-query here (like ndcg_eval) so segmented eval and per-query
    regressions stay visible; a trailing avg() is one bounded agg away.
    `labels` rows with rel > 0 are the positives; unjudged ranked docs
    count as non-relevant. Positions come from `rank_col` when the
    retriever emits deterministic ranks (preferred — re-ranking a
    rounded score here could disagree with the retriever's own
    unrounded tie-breaks), else row_number over (score DESC, id ASC).
    Output per query: (query, n_rel, hits_at_k, p_at_k, r_at_k,
    ap_at_k, rr_at_k) rounded to 6 dp, ordered by query; queries with
    zero judged positives report NULL r_at_k / ap_at_k (undefined, not
    silently 0 — an eval harness should see the hole).

    Scale shape: identical to ndcg_eval — one window partitioned by
    query over CANDIDATE-sized input (retriever top-k, never the
    corpus), one left join against the judgment set, a |queries|-row
    grouped aggregation, and a |queries|-row broadcast join for n_rel.
    All counts are integers; the ratios are exact at 6 dp, so every
    metric is oracle-checkable.
    """
    if rank_col is None:
        w = Window.partitionBy(query_col).orderBy(F.desc(score_col), F.asc(id_col))
        pos = ranked.withColumn("__pos", F.row_number().over(w))
    else:
        pos = ranked.withColumn("__pos", F.col(rank_col).cast("long"))
    is_rel = (F.coalesce(F.col(rel_col).cast("double"), F.lit(0.0)) > 0).cast(
        "int"
    )
    topk = (
        pos.where(F.col("__pos") <= k)
        .join(labels, [query_col, id_col], "left")
        .select(query_col, F.col("__pos"), is_rel.alias("__rel"))
    )
    # running precision at each relevant position, in rank order — one
    # window over the k-bounded candidate rows
    w_run = (
        Window.partitionBy(query_col)
        .orderBy("__pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    scored = topk.withColumn(
        "__cum_rel", F.sum("__rel").over(w_run)
    ).withColumn(
        "__p_at_pos",
        F.col("__cum_rel").cast("double") / F.col("__pos").cast("double"),
    )
    per_q = scored.groupBy(query_col).agg(
        F.sum("__rel").alias("hits_at_k"),
        F.sum(
            F.when(F.col("__rel") == 1, F.col("__p_at_pos")).otherwise(0.0)
        ).alias("__ap_num"),
        F.min(F.when(F.col("__rel") == 1, F.col("__pos"))).alias("__first"),
    )
    n_rel = (
        labels.where(F.col(rel_col) > 0)
        .groupBy(query_col)
        .agg(F.count(F.lit(1)).alias("n_rel"))
    )
    out = per_q.join(F.broadcast(n_rel), query_col, "left").select(
        query_col,
        F.coalesce(F.col("n_rel"), F.lit(0)).alias("n_rel"),
        F.col("hits_at_k").cast("long").alias("hits_at_k"),
        F.round(F.col("hits_at_k") / F.lit(float(k)), 6).alias("p_at_k"),
        F.round(F.col("hits_at_k") / F.col("n_rel"), 6).alias("r_at_k"),
        F.round(
            # least() skips NULLs in both engines, which would turn the
            # no-judged-positives case into a silent 0.0 — keep AP
            # undefined (NULL) there, matching r_at_k
            F.when(
                F.col("n_rel").isNotNull(),
                F.col("__ap_num")
                / F.least(F.col("n_rel"), F.lit(k)).cast("double"),
            ),
            6,
        ).alias("ap_at_k"),
        F.round(
            F.coalesce(1.0 / F.col("__first"), F.lit(0.0)), 6
        ).alias("rr_at_k"),
    )
    return out.orderBy(query_col)


def rank_overlap(
    list_a: DataFrame,
    list_b: DataFrame,
    id_col: str,
    rank_col: str = "r",
    p: float = 0.9,
    k: int = 20,
) -> DataFrame:
    """Rank-biased overlap between two top-k lists (Webber, Moffat &
    Zobel, TOIS 2010), truncated at depth k — the retrieval-change
    monitor: how much did the ranking REALLY move between two index
    builds / retriever versions, weighting the head far above the
    tail (persistence p; p=0.9 puts ~86% of the mass in the top 10).
    RBO_min = (1-p) * sum_{d=1..k} p^(d-1) * |A_d ∩ B_d| / d. An item
    at ranks (ra, rb) enters every depth d >= max(ra, rb), so the sum
    regroups per shared item as sum_{d=m..k} p^(d-1)/d — a bounded
    k-term series. Output: ONE row (k, n_common, rbo) rounded to 6 dp.

    Scale shape: the two inputs are top-k lists BY CONTRACT (bounded
    relations, exactly the rrf_fusion precedent); the join, the
    depth explode (<= k^2 rows total), and the aggregate are all
    k-bounded — corpus-sized data never reaches this operator.
    """
    if not 0 < p < 1:
        raise ValueError("p must be in (0, 1)")
    if k < 1:
        raise ValueError("k must be >= 1")
    a = list_a.select(
        F.col(id_col).alias("__id"), F.col(rank_col).alias("__ra")
    ).where(F.col(rank_col) <= k)
    b = list_b.select(
        F.col(id_col).alias("__id"), F.col(rank_col).alias("__rb")
    ).where(F.col(rank_col) <= k)
    common = a.join(b, "__id").select(
        F.greatest("__ra", "__rb").alias("__m")
    )
    terms = common.select(
        F.explode(F.sequence(F.col("__m"), F.lit(int(k)))).alias("__d")
    ).select(
        (
            F.pow(F.lit(float(p)), F.col("__d") - 1) / F.col("__d")
        ).alias("__w")
    )
    n_common = common.agg(F.count(F.lit(1)).alias("n_common"))
    return (
        terms.agg(
            F.round(
                (1 - F.lit(float(p))) * F.coalesce(F.sum("__w"), F.lit(0.0)),
                6,
            ).alias("rbo")
        )
        .crossJoin(F.broadcast(n_common))
        .select(F.lit(int(k)).alias("k"), "n_common", "rbo")
    )
