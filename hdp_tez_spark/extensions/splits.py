"""Dataset splitting for training pipelines.

Beyond-reference surface (Tez has no expression layer, SURVEY §2.8): the
split-assignment operators a large-scale training-data pipeline needs.
The design constraint at 100 TB is that a split must be a *pure map-side
projection* — deterministic per row, no shuffle, no sampling state — so
the same document lands in the same split on every run, on any cluster,
after any retry. `df.randomSplit` fails all of that (rand() is
recomputed on task retry); a content hash fails none of it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from hdp_tez_spark.extensions.dedup import _md5_long


def hash_bucket(col: Column, buckets: int = 1000) -> Column:
    """Deterministic bucket in [0, buckets): md5-derived 60-bit integer of
    the column's string form, mod buckets. Reproducible in any SQL engine
    as ('0x' || substr(md5(CAST(x AS VARCHAR)), 1, 15))::BIGINT % buckets."""
    return F.pmod(_md5_long(col.cast("string")), F.lit(buckets)).cast("int")


def train_test_split(
    df: DataFrame,
    id_col: str,
    train_frac: float = 0.9,
    buckets: int = 1000,
    bucket_col: str = "bucket",
    split_col: str = "split",
) -> DataFrame:
    """Label every row 'train' or 'test' by a deterministic hash of its id.

    The id (not rand) drives the assignment, so: (a) task retries and
    re-runs produce identical splits; (b) the split survives re-partitioning
    and incremental re-processing — new data joins the same global split
    without touching old rows; (c) train/test never leak into each other
    across pipeline versions. Resolution is `1/buckets` (default 0.1%).

    Zero shuffle: both columns are map-side expressions; the plan stays in
    whole-stage codegen.
    """
    if not 0.0 < train_frac < 1.0:
        raise ValueError(f"train_frac must be in (0, 1), got {train_frac}")
    bucket = hash_bucket(F.col(id_col), buckets)
    cutoff = int(round(train_frac * buckets))
    return df.withColumn(bucket_col, bucket).withColumn(
        split_col,
        F.when(F.col(bucket_col) < cutoff, F.lit("train")).otherwise(F.lit("test")),
    )


def kfold_split(
    df: DataFrame,
    id_col: str,
    k: int = 5,
    fold_col: str = "fold",
) -> DataFrame:
    """Assign every row a fold in [0, k) by a deterministic hash of its id
    — the cross-validation counterpart of `train_test_split`, with the
    same contract: pure map-side projection, zero shuffle, identical
    assignment across retries / re-partitioning / incremental re-runs
    (so fold i's eval set never drifts between pipeline versions).

    Reproducible in any SQL engine as
    ('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 15))::BIGINT % k.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    return df.withColumn(
        fold_col, F.pmod(_md5_long(F.col(id_col).cast("string")), F.lit(k)).cast("int")
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    n: int,
    salt: str = "ws",
) -> DataFrame:
    """Deterministic weighted sample WITHOUT replacement of `n` rows:
    inclusion probability proportional to weight, via the
    Efraimidis–Spirakis A-ES order-sampling key  u^(1/w)  with
    u = (md5_60bit(salt || id) + 1) / 2^60 — take the n largest keys.

    Same contract as the other split operators: the id (not rand())
    drives the draw, so retries, re-partitioning, and incremental re-runs
    all select the identical sample, and the whole draw is reproducible
    in any SQL engine from the md5 formula. Rows with weight <= 0 or
    NULL are excluded (zero-weight rows must never win a slot).

    Scale: the key is a pure map-side projection; selection is
    `orderBy(key desc).limit(n)` — TakeOrderedAndProject keeps per-task
    heaps of n, so nothing global is sorted and only n rows reach the
    driver side of the plan.
    """
    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")
    w = F.col(weight_col).cast("double")
    u = (
        _md5_long(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))) + 1
    ) / F.lit(float(1 << 60))
    key = F.pow(u, F.lit(1.0) / w)
    return (
        df.where(w > 0)
        .withColumn("__k", key)
        .orderBy(F.col("__k").desc(), F.col(id_col))
        .limit(n)
        .drop("__k")
    )


def cluster_split(
    df: DataFrame,
    id_col: str,
    text_col: str,
    train_frac: float = 0.9,
    buckets: int = 1000,
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Leakage-safe split: hash the near-dup *cluster representative*, not
    the document id, so all near-duplicates of a document land in the
    same split. A plain id-hash split silently leaks — two 95%-identical
    copies of one page can straddle train/test, and the model is then
    evaluated on (a paraphrase of) its own training data. This is the
    split a dedup-aware pipeline actually ships.

    Output: (id, rep, split). Cost on top of `dedup_clusters` (whose
    shuffles dominate): one map-side hash of the rep column — the split
    assignment itself adds zero shuffles.
    """
    from hdp_tez_spark.extensions.dedup import dedup_clusters

    if not 0.0 < train_frac < 1.0:
        raise ValueError(f"train_frac must be in (0, 1), got {train_frac}")
    clusters = dedup_clusters(df, id_col, text_col, k=k, threshold=threshold)
    cutoff = int(round(train_frac * buckets))
    return clusters.select(
        F.col(id_col),
        F.col("rep"),
        F.when(hash_bucket(F.col("rep"), buckets) < cutoff, F.lit("train"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


def rendezvous_shard(
    df: DataFrame,
    key_col: str,
    shards: int,
    out: str = "shard",
) -> DataFrame:
    """Highest-random-weight (rendezvous) shard assignment: each key
    goes to argmax over shards of md5(f"{shard}-{key}") — the routing
    rule whose defining property is MINIMAL MOVEMENT: growing N shards
    to N+1 reassigns only ~1/(N+1) of keys (each key moves only if the
    NEW shard wins its rendezvous), where mod-N hashing reshuffles
    almost everything. That is what makes it the right router for
    incrementally-resharded corpus outputs, stateful consumers, and
    cache-affinity layouts at 100 TB. Adds an int `shard` column.

    Scale shape: a pure map-side expression — `shards` md5s per row,
    argmax via array_max over (score, -shard) structs (lowest shard id
    wins a tie, deterministically); zero shuffle, zero state, and the
    same row routes identically on any engine (the md5 recipe is the
    repo's standard SQL-replayable hash).
    """
    if shards <= 0:
        raise ValueError(f"shards must be positive, got {shards}")
    key = F.col(key_col).cast("string")
    candidates = F.array(
        *[
            F.struct(
                _md5_long(F.concat(F.lit(f"{s}-"), key)).alias("score"),
                F.lit(-s).alias("neg_shard"),
            )
            for s in range(shards)
        ]
    )
    best = F.array_max(candidates)
    return df.withColumn(out, (-best["neg_shard"]).cast("int"))


def stratified_kfold(
    df: DataFrame,
    id_col: str,
    strata_cols: Sequence[str],
    k: int = 5,
) -> DataFrame:
    """Stratified k-fold assignment: within every stratum, rows are
    ordered by their deterministic md5 key and dealt round-robin into
    k folds — so each fold carries each stratum's row count to within
    ±1 EXACTLY (plain `kfold_split`'s hash-mod is only asymptotically
    balanced, which skews minority-strata folds: a 50-row stratum can
    land 16/4 across folds and poison per-language eval variance).
    The md5 ordering keeps assignment independent of input order /
    partitioning / retries, same contract as every split here. Output:
    input columns + `fold` in [0, k).

    Scale shape: one keyed window sort per stratum (row_number over
    the md5 key) — the single shuffle; everything else is map-side
    md5 arithmetic reproducible in any SQL engine as
    ('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 15))::BIGINT.
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    from pyspark.sql import Window

    key = _md5_long(F.col(id_col).cast("string"))
    w = Window.partitionBy(*[F.col(c) for c in strata_cols]).orderBy(
        key.asc(), F.col(id_col).asc()
    )
    return df.withColumn(
        "fold", ((F.row_number().over(w) - 1) % k).cast("int")
    )


def time_embargo_split(
    df: DataFrame,
    id_col: str,
    ts_col: str,
    train_frac: float = 0.8,
    embargo_seconds: int = 3600,
) -> DataFrame:
    """Leakage-safe temporal train/test split with an embargo gap (the
    purged split of de Prado '18, standard for any model whose features
    smear information across time — sessionized events, rolling
    aggregates, n-day label windows): the chronologically earliest
    `train_frac` of rows train; rows inside `embargo_seconds` after the
    cutoff are DROPPED (labeled 'embargo') so trailing-window features
    computed on early test rows cannot see training labels; the rest
    test. The cutoff is the smallest timestamp t with
    count(ts <= t) >= ceil(train_frac * n) — a pure order statistic,
    so the split is a deterministic function of the data (ties at the
    cutoff second all fall into train; the achieved train fraction can
    exceed train_frac by the tie mass, the standard convention).
    Output: (id, split) with split in {train, embargo, test}, ordered
    by id.

    Scale shape: raw rows collapse ONCE (map-side combine) to the
    |distinct timestamps| cell table; the cumulative count rides one
    window over THAT table (cell-bounded — the period_over_period
    precedent, allowlisted in tools/plan_lint.py with this reason);
    the 1-row cutoff broadcasts back and labeling is a map-side
    comparison. Integer second arithmetic throughout.
    """
    if not 0.0 < train_frac < 1.0:
        raise ValueError("train_frac must be in (0, 1)")
    if embargo_seconds < 0:
        raise ValueError("embargo_seconds must be >= 0")
    ts = F.col(ts_col).cast("timestamp")
    base = df.where(ts.isNotNull()).select(
        F.col(id_col).alias("id"), F.unix_timestamp(ts).alias("__t")
    )
    cells = base.groupBy("__t").agg(F.count(F.lit(1)).alias("__c"))
    w = Window.orderBy("__t").rowsBetween(Window.unboundedPreceding, 0)
    n_tab = cells.groupBy().agg(F.sum("__c").alias("__n"))
    cutoff = (
        cells.withColumn("__cum", F.sum("__c").over(w))
        .crossJoin(F.broadcast(n_tab))
        .where(F.col("__cum") >= F.ceil(F.lit(train_frac) * F.col("__n")))
        .groupBy()
        .agg(F.min("__t").alias("__cut"))
    )
    return (
        base.crossJoin(F.broadcast(cutoff))
        .select(
            "id",
            F.when(F.col("__t") <= F.col("__cut"), F.lit("train"))
            .when(
                F.col("__t") <= F.col("__cut") + embargo_seconds,
                F.lit("embargo"),
            )
            .otherwise(F.lit("test"))
            .alias("split"),
        )
        .orderBy("id")
    )
