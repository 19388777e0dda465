"""Sort operators: global sort, secondary sort, top-k.

Reference parity map (SURVEY §2.5):

- Global sort: Tez samples the input, builds a `TotalOrderPartitioner`
  range partitioning, then sorts each partition
  (`tez-tests/.../examples/Sort.java:101-169`). Spark's `orderBy` does
  exactly this internally (RangePartitioning with reservoir sampling) —
  `global_sort` is the declarative form, scaling to any size because no
  single task ever holds the whole dataset.
- Secondary sort: Tez partitions by the first key, sorts the composite key,
  and groups by the first key (`tez-tests/.../examples/SecondarySort.java:54`,
  FirstPartitioner :136, FirstGroupingComparator :148-163; secondary
  comparator conf `TezRuntimeConfiguration.java:361`). Spark:
  `repartition(k1).sortWithinPartitions(k1, k2)` reproduces the physical
  layout; `secondary_sort_ranked` exposes the observable semantics (value
  order within each group) as a window rank so it is oracle-checkable.
- Top-K: absent in Tez (only a parallelism-1 funnel vertex,
  `OrderedWordCount.java:163-165`); Spark's `orderBy().limit(k)` compiles to
  TakeOrderedAndProject — per-partition heap + driver merge of k rows, no
  global shuffle at all. Strictly better than the Tez pattern at any scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_sort(df: DataFrame, order: Sequence[Column]) -> DataFrame:
    """Total-order sort via sampled range partitioning (Sort.java parity)."""
    return df.orderBy(*order)


def global_sort_ranked(df: DataFrame, order: Sequence[Column], rank_name: str = "rn") -> DataFrame:
    """Global sort with an explicit global rank column so sortedness itself
    is an observable, oracle-checkable output.

    Implementation avoids the naive single-partition `Window.orderBy`
    (which would funnel all rows through one task — the Tez parallelism-1
    anti-pattern): rows are range-partitioned and ranked within each
    partition, then offset by the exact counts of the preceding partitions
    (two jobs, no single-task bottleneck). This is how global row-numbering
    must be done at 100 TB.
    """
    part = Window.partitionBy("__pid").orderBy(*order)
    # rank(), not row_number(): deterministic under duplicate sort keys.
    # Correct globally because repartitionByRange co-locates equal keys, so
    # a tie group never spans partitions and local-rank + preceding-count
    # equals global rank.
    #
    # The lazy localCheckpoint PIN below is load-bearing (found at scale,
    # r10): `ranked` is referenced twice — by the offsets join's main side
    # and by the `counts` subtree. Those are only consistent if Spark
    # reuses one exchange; when callers stack this operator (rfm_scores
    # chained it three deep) reuse breaks, the two instantiations get
    # DIFFERENT AQE-coalesced partition counts, and the inner join on
    # __pid silently drops every row whose pid exceeds the counts side's
    # range (sf1.0: 150k rows -> a nondeterministic ~62k). spark_partition_id
    # is partitioning metadata, not data — any plan that reads it twice
    # must read it from ONE materialization. The pin also makes the ranks
    # stable for consumers that self-join the output (sorted-neighborhood
    # pairing). Blocks are freed by the ContextCleaner once the caller's
    # reference drops (the sweep GC-nudges between queries).
    ranked = (
        df.repartitionByRange(*order)
        .withColumn("__pid", F.spark_partition_id())
        .withColumn("__local_rn", F.rank().over(part))
        .localCheckpoint(eager=False)
    )
    counts = (
        ranked.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .withColumn(
            "__offset",
            F.coalesce(
                F.sum("__cnt").over(
                    Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("__pid", "__offset")
    )
    return (
        ranked.join(F.broadcast(counts), "__pid")
        .withColumn(rank_name, (F.col("__local_rn") + F.col("__offset")).cast("long"))
        .drop("__pid", "__local_rn", "__offset")
    )


def secondary_sort(
    df: DataFrame, partition_key: str, secondary: Sequence[str], num_partitions: int | None = None
) -> DataFrame:
    """Physical secondary sort: co-locate each group, order rows within the
    partition by (partition_key, *secondary) — `SecondarySort.java` parity.
    Downstream per-group iteration sees values in secondary order, exactly
    like Tez's grouped `KeyValuesReader` under a secondary comparator.
    """
    parts = [num_partitions] if num_partitions else []
    return df.repartition(*parts, partition_key).sortWithinPartitions(
        partition_key, *secondary
    )


def secondary_sort_ranked(
    df: DataFrame,
    partition_key: str,
    secondary: Sequence[str],
    rank_name: str = "rn",
    unique: bool = False,
) -> DataFrame:
    """Observable secondary-sort semantics: rank of each row within its
    group under the secondary order. Uses rank() (deterministic under
    duplicate secondary keys); pass `unique=True` for row_number() when the
    caller guarantees the secondary key is a total order.
    """
    w = Window.partitionBy(partition_key).orderBy(*[F.col(c) for c in secondary])
    fn = F.row_number() if unique else F.rank()
    return df.withColumn(rank_name, fn.over(w))


def sorted_group_apply(
    df: DataFrame,
    partition_key: str | Sequence[str],
    secondary: Sequence[str],
    func,
    schema,
) -> DataFrame:
    """Grouping-comparator parity (SURVEY §4.6 item 2): run arbitrary user
    code over each group with the group's rows presented in secondary-key
    order — exactly what a Tez reduce processor sees from a grouped
    `KeyValuesReader` under a secondary comparator
    (`SecondarySort.java:148-163,229`, `TezRuntimeConfiguration.java:361`).

    `func(pdf: pandas.DataFrame) -> pandas.DataFrame` receives one group,
    already sorted by `secondary` (stable sort, so input order breaks any
    remaining ties deterministically only if the caller's secondary key is
    total — include a tiebreaker column otherwise).

    Scale: one shuffle by the group key; each group must fit an executor's
    Arrow batch (same constraint as any applyInPandas). For huge groups
    use `secondary_sort` + `mapInPandas` over pre-sorted partitions
    instead.
    """
    keys = [partition_key] if isinstance(partition_key, str) else list(partition_key)
    sec = list(secondary)

    def wrapped(pdf):
        return func(pdf.sort_values(sec, kind="mergesort", ignore_index=True))

    return df.groupBy(*keys).applyInPandas(wrapped, schema)


def top_k(df: DataFrame, order: Sequence[Column], k: int) -> DataFrame:
    """ORDER BY ... LIMIT k == TakeOrderedAndProject (heap per partition,
    merge of k at the driver)."""
    return df.orderBy(*order).limit(k)


def top_k_per_group(
    df: DataFrame, group: str, order: Sequence[Column], k: int, rank_name: str = "rn"
) -> DataFrame:
    """Top-k within each group via ranked window + filter. Spark pushes the
    limit into the sort per partition (WindowGroupLimit in recent Spark),
    so the full window is never materialized."""
    w = Window.partitionBy(group).orderBy(*order)
    return df.withColumn(rank_name, F.row_number().over(w)).where(F.col(rank_name) <= k)


def ntile_exact(
    df: DataFrame,
    order: Sequence[Column],
    k: int,
    out: str = "bucket",
) -> DataFrame:
    """Exact k-quantile bucket assignment over a total order — NTILE
    semantics without the single-task window funnel.

    bucket = ((global_rank - 1) * k) DIV total, integer arithmetic
    throughout (no float quantile boundaries). Identical to SQL
    NTILE(k) whenever k divides the row count; for ragged counts SQL
    NTILE front-loads remainders while this formula spreads them —
    documented, deterministic, and the formula any engine reproduces
    exactly.

    Scale: rank comes from `global_sort_ranked` (range partition +
    per-partition rank + exact offsets — two jobs, no funnel); the
    total is a 1-row aggregate cross join. The caller's order must be
    total (include a tiebreak column) or equal-key rows straddle a
    bucket boundary nondeterministically.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    ranked = global_sort_ranked(df, order, "__rank")
    total = df.select(F.count(F.lit(1)).alias("__total"))
    return (
        ranked.crossJoin(total)
        .withColumn(out, F.expr(f"(__rank - 1) * {int(k)} DIV __total").cast("int"))
        .drop("__rank", "__total")
    )


def prefix_sum(
    df: DataFrame,
    order: Sequence[Column],
    value_col: str | Sequence[str],
    out: str | Sequence[str] = "cumsum",
) -> DataFrame:
    """Distributed running total(s) over a global order — the prefix-sum
    primitive behind exact quantiles, equi-depth histogramming, rank
    statistics and pagination. `value_col`/`out` accept a single column
    name or parallel sequences: N cumulative columns share ONE range
    shuffle, one window pass, and one offsets broadcast (a caller
    needing two running totals must not pay the machinery twice — the
    r05 ks_test review finding).

    Same two-job shape as `global_sort_ranked` (the scale-safe form of
    what Tez's parallelism-1 funnel vertex computes,
    `OrderedWordCount.java:163-165`): range-partition on the order keys,
    cumulative sum within each partition, then add the exact sum of all
    preceding partitions via a broadcast of per-partition totals. No task
    ever sees more than one partition; the offset table is one row per
    partition.

    The caller's order must be TOTAL (include a tiebreak column) — the
    within-partition frame is row-based, so ties would otherwise
    accumulate in nondeterministic order.
    """
    vcols = [value_col] if isinstance(value_col, str) else list(value_col)
    outs = [out] if isinstance(out, str) else list(out)
    if len(vcols) != len(outs):
        raise ValueError(
            f"value_col/out length mismatch: {len(vcols)} != {len(outs)}"
        )
    local_w = (
        Window.partitionBy("__pid")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    with_local = df.repartitionByRange(*order).withColumn(
        "__pid", F.spark_partition_id()
    )
    for i, vc in enumerate(vcols):
        with_local = with_local.withColumn(
            f"__local_sum{i}", F.sum(vc).over(local_w)
        )
    # Same load-bearing pin as global_sort_ranked (found at scale, r10):
    # `with_local` is referenced by BOTH the offsets subtree and the main
    # join side; spark_partition_id is partitioning metadata and may only
    # be read from ONE materialization, or a broken exchange reuse gives
    # the two sides different AQE partition counts and the inner __pid
    # join silently drops rows.
    with_local = with_local.localCheckpoint(eager=False)
    offsets = with_local.groupBy("__pid").agg(
        *[F.sum(vc).alias(f"__part_total{i}") for i, vc in enumerate(vcols)]
    )
    prev_w = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    for i in range(len(vcols)):
        offsets = offsets.withColumn(
            f"__offset{i}",
            F.coalesce(F.sum(f"__part_total{i}").over(prev_w), F.lit(0)),
        )
    offsets = offsets.select(
        "__pid", *[f"__offset{i}" for i in range(len(vcols))]
    )
    joined = with_local.join(F.broadcast(offsets), "__pid")
    for i, o in enumerate(outs):
        joined = joined.withColumn(
            o, F.col(f"__local_sum{i}") + F.col(f"__offset{i}")
        )
    drops = (
        ["__pid"]
        + [f"__local_sum{i}" for i in range(len(vcols))]
        + [f"__offset{i}" for i in range(len(vcols))]
    )
    return joined.drop(*drops)
