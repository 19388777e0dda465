"""Aggregation operators.

Reference parity map:

- Sort-based group-agg: Tez sorts the shuffle (`OrderedPartitionedKVOutput`,
  `runtime/library/output/OrderedPartitionedKVOutput.java:63`), merges and
  groups on the reduce side (`OrderedGroupedKVInput.java:71`,
  `ValuesIterator.java:47`), and user code sums the group
  (`tez-examples/.../WordCount.java:113-140` SumProcessor). In Spark this
  whole pipeline is `df.groupBy(keys).agg(...)` — Catalyst picks hash or
  sort aggregation and Tungsten runs it codegen'd.
- Combiner (map-side partial agg): Tez runs a user Combiner over spill runs
  (`runtime/library/common/combine/Combiner.java:39-41`,
  `TezRuntimeConfiguration.java:162`). Spark applies partial aggregation
  automatically in every agg — the exchange carries partial states, which at
  100 TB is what keeps the shuffle proportional to |groups|, not |rows|.
- Hash aggregation: user-side HashMap in `tez-tests/.../UnionExample.java:113-161`;
  Spark's HashAggregateExec is the built-in, vectorized version.
- MRR group-then-order chain (`tez-tests/.../GroupByOrderByMRRTest.java:99-196`):
  a 3-vertex Tez DAG == one `groupBy().agg().orderBy()` query here.
- Grouping sets / cube / rollup are absent in Tez (no expression layer);
  exposed here for engine-surface completeness.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hdp_tez_spark.plans.checkpoints import truncate_lineage


def group_agg(df: DataFrame, keys: Sequence[str], aggs: Sequence[Column]) -> DataFrame:
    """GROUP BY keys with arbitrary aggregate expressions.

    Partial (combiner) aggregation is applied automatically map-side; the
    shuffle moves only per-partition partial states keyed by `keys`.
    """
    return df.groupBy(*keys).agg(*aggs)


def group_then_order(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Sequence[Column],
    order: Sequence[Column],
) -> DataFrame:
    """The canonical Tez MRR pattern (map -> groupby-reduce -> orderby-reduce)
    as one declarative query (`GroupByOrderByMRRTest.java:108-196`).

    Catalyst fuses this into scan -> partial agg -> exchange -> final agg ->
    range-partitioned sort; AQE sizes both exchanges at runtime the way
    ShuffleVertexManager would.
    """
    return df.groupBy(*keys).agg(*aggs).orderBy(*order)


def distinct_rows(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """DISTINCT == group-by-all-keys-no-values (not a Tez primitive; it is
    expressible as a grouped edge with no values — SURVEY §2.6)."""
    return (df.select(*cols) if cols else df).distinct()


def rollup_agg(df: DataFrame, keys: Sequence[str], aggs: Sequence[Column]) -> DataFrame:
    """ROLLUP over keys (beyond-reference surface; SURVEY §2.6)."""
    return df.rollup(*keys).agg(*aggs)


def cube_agg(df: DataFrame, keys: Sequence[str], aggs: Sequence[Column]) -> DataFrame:
    """CUBE over keys (beyond-reference surface; SURVEY §2.6)."""
    return df.cube(*keys).agg(*aggs)


def pivot_agg(
    df: DataFrame,
    keys: Sequence[str],
    pivot_col: str,
    pivot_values: Sequence[str],
    agg: Column,
) -> DataFrame:
    """PIVOT: rotate `pivot_col`'s values into columns, one `agg` per cell
    (beyond-reference surface; SURVEY §2.6 — Tez has no pivot operator).

    `pivot_values` is REQUIRED, not optional, as a scale rule: without an
    explicit value list Spark first runs a distinct job over `pivot_col`
    to discover the columns — an extra full pass over the data at 100 TB
    (and a nondeterministic schema if values drift). With the list given,
    the pivot compiles to one pass of conditional aggregation — the same
    plan as manual `sum(when(col = v, x))` columns.
    """
    return df.groupBy(*keys).pivot(pivot_col, list(pivot_values)).agg(agg)


def unpivot_melt(
    df: DataFrame,
    ids: Sequence[str],
    values: Sequence[str],
    var_name: str = "metric",
    value_name: str = "value",
) -> DataFrame:
    """UNPIVOT / melt: rotate `values` columns into (metric, value) rows —
    the inverse of `pivot_agg` (beyond-reference surface; SURVEY §2.6).

    Compiles to a single map-side Expand (one input row -> len(values)
    output rows) — no shuffle, no join, the exact dual of pivot's
    conditional aggregation. All `values` columns must share a common
    type (cast beforehand); at any scale this is a pure projection."""
    return df.unpivot(list(ids), list(values), var_name, value_name)


def count_by_key(df: DataFrame, key: str, count_name: str = "cnt") -> DataFrame:
    """WordCount-style (key, count) aggregation (`WordCount.java:113-140`)."""
    return df.groupBy(key).agg(F.count(F.lit(1)).alias(count_name))


def approx_distinct(
    df: DataFrame, keys: Sequence[str], col: str, rsd: float = 0.05
) -> DataFrame:
    """Approximate COUNT(DISTINCT) per group (HyperLogLog++). At 100 TB an
    exact distinct is a full shuffle of every distinct value; the sketch
    shuffles a fixed-size register set per group instead. `rsd` is the
    target relative standard deviation."""
    return df.groupBy(*keys).agg(
        F.approx_count_distinct(col, rsd).alias("approx_distinct")
    )


def hll_sketches(df: DataFrame, keys: Sequence[str], col: str) -> DataFrame:
    """Mergeable HLL sketches per group (Apache DataSketches binary) — the
    pre-aggregation pattern: persist per-partition/day sketches once, then
    answer any rollup by unioning sketches (`hll_union_agg`) without
    touching the raw 100 TB again."""
    return df.groupBy(*keys).agg(F.hll_sketch_agg(col).alias("sketch"))


def hll_rollup(sketches: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Union pre-built sketches down to a coarser grouping and estimate."""
    return sketches.groupBy(*keys).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("approx_distinct")
    )


def hll_set_overlap(
    a: DataFrame, b: DataFrame, col: str
) -> DataFrame:
    """Set-overlap estimation from mergeable HLL sketches: |A|, |B|,
    |A ∪ B| directly from sketch union, and |A ∩ B| by
    inclusion-exclusion — the constant-memory way to ask "how many users
    appear in both of these 100 TB event streams" without shuffling
    either key set.

    Output: ONE row (est_a, est_b, est_union, est_intersection) of
    double estimates. Each input collapses to a single sketch
    (partial-aggregated, bytes not keys move); the final union merges
    two sketch rows. Inclusion-exclusion compounds the sketches' rsd,
    so small true intersections disappear into the noise — the driver
    query pins the error contract against exact counts.
    """
    # each 1-row sketch feeds both the union and its own estimate —
    # checkpoint so each input is scanned once, not once per consumer
    sa = a.agg(F.hll_sketch_agg(col).alias("sk")).transform(truncate_lineage)
    sb = b.agg(F.hll_sketch_agg(col).alias("sk")).transform(truncate_lineage)
    both = sa.unionByName(sb)
    u = both.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_union")
    )
    ea = sa.select(F.hll_sketch_estimate("sk").alias("est_a"))
    eb = sb.select(F.hll_sketch_estimate("sk").alias("est_b"))
    return (
        ea.crossJoin(F.broadcast(eb))
        .crossJoin(F.broadcast(u))
        .select(
            "est_a",
            "est_b",
            "est_union",
            # inclusion-exclusion can go slightly negative on disjoint
            # sets (independent sketch errors) — clamp: it's a cardinality
            F.greatest(
                F.lit(0.0),
                F.col("est_a") + F.col("est_b") - F.col("est_union"),
            ).alias("est_intersection"),
        )
    )


def grouping_sets_agg(
    df: DataFrame,
    sets: Sequence[Sequence[str]],
    keys: Sequence[str],
    aggs: Sequence[Column],
) -> DataFrame:
    """GROUPING SETS over explicit key subsets (beyond-reference surface;
    SURVEY §2.6 — Tez has no expression layer, so rollup/cube/sets live
    only in its clients). One pass over the input; Spark expands the sets
    with a single Expand node before the aggregation, so the shuffle still
    carries partial states only."""
    return df.groupingSets([list(s) for s in sets], *[F.col(k) for k in keys]).agg(
        *aggs
    )


def numeric_histogram(
    df: DataFrame,
    col: str,
    bins: int = 20,
) -> DataFrame:
    """Fixed-width histogram of a numeric column: (bin, bin_lo, bin_hi,
    cnt), bins spanning [min, max] with the max value clamped into the
    last bin. The dataset-profiling primitive (outlier checks, filter
    threshold tuning) a curation pipeline runs before committing to
    cutoffs.

    Two scans, both trivial: a 1-row min/max aggregate that AQE
    broadcasts into a map-side bin expression (floor arithmetic in
    float64 — identical IEEE ops in any engine, so bin edges are
    engine-reproducible), then one groupBy(bin) count whose shuffle
    carries `bins` partial counts per task. Nothing scales with row
    count except the scans themselves.
    """
    if bins <= 0:
        raise ValueError(f"bins must be positive, got {bins}")
    x = F.col(col).cast("double")
    stats = df.agg(
        F.min(x).alias("__lo"), F.max(x).alias("__hi")
    )
    width = (F.col("__hi") - F.col("__lo")) / F.lit(float(bins))
    bin_ = F.least(
        F.lit(bins - 1).cast("long"),
        F.floor((x - F.col("__lo")) / width),
    )
    return (
        df.crossJoin(F.broadcast(stats))
        .select(
            bin_.alias("bin"),
            F.round(F.col("__lo") + bin_ * width, 6).alias("bin_lo"),
            F.round(F.col("__lo") + (bin_ + 1) * width, 6).alias("bin_hi"),
        )
        .groupBy("bin", "bin_lo", "bin_hi")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
