"""Data-quality operators: one-pass column profiling and referential-
integrity audits.

Beyond-reference surface (the reference engine has no expression layer —
SURVEY §2.8; Hive-on-Tez users run ANALYZE TABLE ... COMPUTE STATISTICS
for the same purpose). These are the checks a pipeline runs before it
trusts a 100 TB drop of new data: per-column null/distinct/bounds
profiles, and orphan counts across the fact/dimension joins the rest of
the pipeline is about to assume hold.

Scale shape:
- `profile_table` is ONE aggregation pass. Multiple exact
  count-distincts make Catalyst plan an Expand (input multiplied by the
  number of profiled columns) feeding a single partially-aggregated
  shuffle — the standard exact-multi-distinct trade; profile the columns
  you need, not `*`. The wide 1-row result is unpivoted map-side.
- `fk_violations` is one anti-join per direction; both sides aggregate
  to counts before anything reaches the driver. AQE broadcasts the
  dimension side when it fits.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hdp_tez_spark.plans.checkpoints import truncate_lineage

_NUMERIC = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
)


def profile_table(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Per-column profile in one aggregation pass. Output: one row per
    profiled column —
    (col_name, n_rows, n_null, n_distinct, min_val, max_val)
    where min/max are DOUBLE for numeric columns and NULL for
    non-numeric ones (NULLs excluded from distinct, per SQL COUNT
    DISTINCT semantics).
    """
    if not cols:
        raise ValueError("cols must be non-empty")
    dtypes = dict((f.name, f.dataType) for f in df.schema.fields)
    aggs: list = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        if c not in dtypes:
            raise ValueError(f"unknown column: {c}")
        is_num = isinstance(dtypes[c], _NUMERIC)
        aggs.append(F.count(F.col(c)).alias(f"__nn_{c}"))
        aggs.append(F.countDistinct(F.col(c)).alias(f"__nd_{c}"))
        aggs.append(
            (F.min(F.col(c)).cast("double") if is_num else F.lit(None).cast("double")).alias(
                f"__mn_{c}"
            )
        )
        aggs.append(
            (F.max(F.col(c)).cast("double") if is_num else F.lit(None).cast("double")).alias(
                f"__mx_{c}"
            )
        )
    wide = df.agg(*aggs)
    rows = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col("__n").alias("n_rows"),
            (F.col("__n") - F.col(f"__nn_{c}")).alias("n_null"),
            F.col(f"__nd_{c}").alias("n_distinct"),
            F.col(f"__mn_{c}").alias("min_val"),
            F.col(f"__mx_{c}").alias("max_val"),
        )
        for c in cols
    ]
    return wide.select(F.explode(F.array(*rows)).alias("p")).select("p.*")


def fk_violations(
    child: DataFrame,
    child_key: str,
    parent: DataFrame,
    parent_key: str,
    relation: str = "fk",
) -> DataFrame:
    """Audit one foreign-key edge. Output: ONE row
    (relation, n_child, n_parent, orphan_children, childless_parents) —
    orphan_children = child rows whose key has no parent (NULL keys
    count as orphans: they reference nothing), childless_parents =
    distinct parent keys never referenced.
    """
    c = child.select(F.col(child_key).alias("__ck"))
    p = parent.select(F.col(parent_key).alias("__pk"))
    orphans = c.join(p.distinct(), c["__ck"] == p["__pk"], "left_anti").agg(
        F.count(F.lit(1)).alias("orphan_children")
    )
    childless = (
        p.distinct()
        .join(c.distinct(), c["__ck"] == p["__pk"], "left_anti")
        .agg(F.count(F.lit(1)).alias("childless_parents"))
    )
    nc = c.agg(F.count(F.lit(1)).alias("n_child"))
    np_ = p.agg(F.count(F.lit(1)).alias("n_parent"))
    return (
        nc.crossJoin(F.broadcast(np_))
        .crossJoin(F.broadcast(orphans))
        .crossJoin(F.broadcast(childless))
        .select(
            F.lit(relation).alias("relation"),
            "n_child",
            "n_parent",
            "orphan_children",
            "childless_parents",
        )
    )


def key_skew_stats(df: DataFrame, key_col: str, top_n: int = 10) -> DataFrame:
    """Skew diagnosis for a prospective shuffle key: the `top_n` heaviest
    key values with their share of all rows, plus the global row count
    and distinct-key count on every row for context. Output:
    (key_value as string, cnt, share, n_rows, n_keys), heaviest first.

    This is the measurement behind the salt-or-not decision
    (`operators/joins.salted_join`) and AQE's skew-join threshold: a top
    key holding >> 1/partitions of the rows is the hot partition. Cost:
    one partially-aggregated groupBy (shuffle ∝ |keys|), a |keys|-row
    stats aggregate, and a TakeOrderedAndProject for the top slice —
    nothing row-shaped leaves the executors.
    """
    if top_n <= 0:
        raise ValueError(f"top_n must be positive, got {top_n}")
    counts = df.groupBy(F.col(key_col).cast("string").alias("key_value")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    totals = counts.agg(
        F.sum("cnt").alias("n_rows"), F.count(F.lit(1)).alias("n_keys")
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "key_value",
            "cnt",
            F.round(F.col("cnt") / F.col("n_rows"), 6).alias("share"),
            "n_rows",
            "n_keys",
        )
        .orderBy(F.col("cnt").desc(), "key_value")
        .limit(top_n)
    )


def k_anonymity(
    df: DataFrame, quasi_cols: Sequence[str], k: int = 5
) -> DataFrame:
    """Privacy audit before a corpus release: is every row hidden in a
    crowd of at least `k` sharing its quasi-identifier combination?
    Output: ONE row (k, n_rows, n_groups, min_group_size,
    violating_groups, violating_rows, anonymous_share) where a
    violating group has fewer than `k` rows and anonymous_share is the
    fraction of rows that are k-anonymous (rounded to 6 dp).

    Scale shape: one partially-aggregated groupBy over the
    quasi-identifier tuple (shuffle ∝ |distinct combinations|) followed
    by a 1-row aggregate of the |groups|-sized table — the same cost
    profile as `key_skew_stats`; nothing row-shaped leaves the
    executors. NULL quasi-identifier values form their own group, per
    GROUP BY semantics — they are equally linkable.
    """
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    groups = df.groupBy(*[F.col(c) for c in quasi_cols]).agg(
        F.count(F.lit(1)).alias("sz")
    )
    viol = F.col("sz") < k
    return groups.agg(
        F.sum("sz").alias("n_rows"),
        F.count(F.lit(1)).alias("n_groups"),
        F.min("sz").alias("min_group_size"),
        F.sum(viol.cast("long")).alias("violating_groups"),
        F.sum(F.when(viol, F.col("sz")).otherwise(0)).alias("violating_rows"),
        F.round(
            F.sum(F.when(viol, 0).otherwise(F.col("sz"))) / F.sum("sz"), 6
        ).alias("anonymous_share"),
    ).select(
        F.lit(k).cast("long").alias("k"),
        "n_rows",
        "n_groups",
        "min_group_size",
        "violating_groups",
        "violating_rows",
        "anonymous_share",
    )


def l_diversity(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
    l: int = 2,
) -> DataFrame:
    """The companion audit to `k_anonymity`: k-anonymity hides a row in
    a crowd, but if everyone in the crowd shares the same SENSITIVE
    value the attacker still learns it (the homogeneity attack).
    A quasi-identifier group is l-diverse when it contains at least `l`
    distinct sensitive values. Output: ONE row (l, n_groups,
    min_distinct_sensitive, violating_groups, violating_rows,
    diverse_share) — diverse_share is the fraction of rows in l-diverse
    groups, rounded to 6 dp.

    Scale shape: distinct-collapse on (quasi..., sensitive) first, then
    the group sizes and distinct-sensitive counts come from ONE further
    groupBy — both shuffles are bounded by |distinct combinations|, and
    Catalyst plans the pair as the classic two-level partial-agg
    cascade; nothing row-shaped leaves the executors. NULL sensitive
    values count as one more distinct value (they are a disclosure of
    their own).
    """
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    if l <= 0:
        raise ValueError(f"l must be positive, got {l}")
    qs = [F.col(c) for c in quasi_cols]
    groups = df.groupBy(*qs).agg(
        F.count(F.lit(1)).alias("sz"),
        # count_distinct ignores NULL; add it back as its own value
        (
            F.count_distinct(F.col(sensitive_col))
            + F.max(F.col(sensitive_col).isNull().cast("long"))
        ).alias("nd"),
    )
    viol = F.col("nd") < l
    return groups.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.min("nd").alias("min_distinct_sensitive"),
        F.sum(viol.cast("long")).alias("violating_groups"),
        F.sum(F.when(viol, F.col("sz")).otherwise(0)).alias("violating_rows"),
        F.round(
            F.sum(F.when(viol, 0).otherwise(F.col("sz"))) / F.sum("sz"), 6
        ).alias("diverse_share"),
    ).select(
        F.lit(l).cast("long").alias("l"),
        "n_groups",
        "min_distinct_sensitive",
        "violating_groups",
        "violating_rows",
        "diverse_share",
    )


def psi_drift(
    baseline: DataFrame,
    current: DataFrame,
    value_col: str,
    bins: int = 10,
) -> DataFrame:
    """Population Stability Index between two drops of the same numeric
    column — the standard drift alarm for recurring ingests (rule of
    thumb: PSI < 0.1 stable, 0.1-0.25 drifting, > 0.25 shifted).
    Bin edges are fixed-width over the BASELINE's [min, max] (current
    values outside clamp into the edge bins, so new mass beyond the old
    range is visible as edge-bin drift). Per bin:
    psi_contrib = (p_cur - p_base) * ln(p_cur / p_base), with both
    shares Laplace-smoothed by 0.5 rows so empty bins stay finite; the
    column's PSI is sum(psi_contrib). Output: EXACTLY `bins` rows
    (bin, lo, hi, n_base, n_cur, share_base, share_cur, psi_contrib)
    ordered by bin — bins empty on both sides appear with zero counts
    (a broadcast bin spine fills them), so the smoothed shares sum to 1
    and a plot over the documented bucket edges has no holes.

    Scale shape: one 1-row min/max aggregate over the baseline
    (broadcast to both sides — the `histogram` recipe), then one
    partial-agg groupBy per side whose shuffle is `bins` rows per
    partition, and a |bins|-row join. Two scans total, nothing
    row-shaped past the aggregates — drift-checking a 100 TB drop costs
    the same as counting it.
    """
    if bins <= 0:
        raise ValueError(f"bins must be positive, got {bins}")
    v = F.col(value_col).cast("double")
    stats = baseline.agg(
        F.min(v).alias("__mn"), F.max(v).alias("__mx")
    )

    def binned(df: DataFrame, name: str) -> DataFrame:
        width = (F.col("__mx") - F.col("__mn")) / bins
        raw = F.when(width > 0, F.floor((v - F.col("__mn")) / width)).otherwise(
            F.lit(0)
        )
        b = F.least(F.greatest(raw, F.lit(0)), F.lit(bins - 1)).cast("int")
        return (
            df.crossJoin(F.broadcast(stats))
            .where(v.isNotNull())
            .groupBy(b.alias("bin"))
            .agg(F.count(F.lit(1)).alias(name))
        )

    base = binned(baseline, "n_base")
    cur = binned(current, "n_cur")
    spine = baseline.sparkSession.range(bins).select(
        F.col("id").cast("int").alias("bin")
    )
    joined = (
        spine.join(base, "bin", "left")
        .join(cur, "bin", "left")
        .select(
            "bin",
            F.coalesce("n_base", F.lit(0)).alias("n_base"),
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
        )
    )
    tot = joined.agg(
        F.sum("n_base").alias("__tb"), F.sum("n_cur").alias("__tc")
    )
    p = (F.col("n_base") + 0.5) / (F.col("__tb") + 0.5 * bins)
    q = (F.col("n_cur") + 0.5) / (F.col("__tc") + 0.5 * bins)
    return (
        joined.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(stats))
        .select(
            "bin",
            F.round(
                F.col("__mn") + F.col("bin") * (F.col("__mx") - F.col("__mn")) / bins, 6
            ).alias("lo"),
            F.round(
                F.col("__mn")
                + (F.col("bin") + 1) * (F.col("__mx") - F.col("__mn")) / bins,
                6,
            ).alias("hi"),
            "n_base",
            "n_cur",
            F.round(p, 6).alias("share_base"),
            F.round(q, 6).alias("share_cur"),
            F.round((q - p) * F.log(q / p), 6).alias("psi_contrib"),
        )
        .orderBy("bin")
    )


def benford_audit(df: DataFrame, value_col: str) -> DataFrame:
    """First-significant-digit distribution vs Benford's law — the
    forensic screen for fabricated or mechanically-generated numeric
    columns (amounts, populations, counts spanning magnitudes follow
    log10(1 + 1/d); synthetic or capped data usually doesn't).

    Rows with NULL, zero, or non-finite (NaN/Infinity) values carry no
    leading digit and are excluded. Output: one row per digit 1-9 (digits absent from the
    data still appear, n = 0): (digit, n, share, expected, chi2_term)
    where chi2_term = n_total * (share - expected)^2 / expected — sum
    the column for the chi-square statistic against Benford (8 dof).
    Shares rounded to 6 dp.

    Scale shape: the leading digit is pure column arithmetic
    (floor(|x| / 10^floor(log10|x|)) — no string formatting), so the
    corpus collapses map-side to AT MOST 9 groups; the digit spine is a
    9-row literal table the aggregate left-joins, so absent digits cost
    nothing. One partial-agg shuffle of <= 9 rows per partition.
    """
    x = F.abs(F.col(value_col).cast("double"))
    # Boundary repair, not a blind clamp: for doubles a hair below a
    # power of ten (true leading digit 9), libm log10 can round UP to
    # the next integer, making the quotient < 1 and the raw digit 0 —
    # the row belongs to digit NINE. Symmetrically, if log10 of a value
    # at/above a power of ten rounds DOWN, the quotient reaches 10 and
    # the row belongs to digit ONE. Such rows must stay on the 1-9
    # spine under their TRUE digit, not fall off or land clamped to the
    # wrong end.
    raw_digit = F.floor(x / F.pow(F.lit(10.0), F.floor(F.log10(x)))).cast("int")
    digit = (
        F.when(raw_digit <= 0, F.lit(9))
        .when(raw_digit >= 10, F.lit(1))
        .otherwise(raw_digit)
    )
    # NaN sorts above everything in Spark so it would pass x > 0, and
    # Infinity yields a NaN quotient; both non-finite classes carry no
    # leading digit and are excluded (mirrored by isfinite() in oracles)
    finite = ~F.isnan(x) & (x != F.lit(float("inf")))
    counts = (
        df.where(F.col(value_col).isNotNull() & (x > 0) & finite)
        .groupBy(digit.alias("digit"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    spark = df.sparkSession
    spine = spark.createDataFrame([(d,) for d in range(1, 10)], "digit int")
    # lineage-truncated: both the total and the final select consume
    # `joined`; without the cut each consumer re-scans the raw corpus
    joined = (
        F.broadcast(spine)
        .join(counts, "digit", "left")
        .withColumn("n", F.coalesce(F.col("n"), F.lit(0)))
        .transform(truncate_lineage)
    )
    total = joined.agg(F.sum("n").alias("__t"))
    expected = F.log10(1.0 + 1.0 / F.col("digit"))
    share = F.col("n") / F.col("__t")
    chi2 = F.col("__t") * (share - expected) * (share - expected) / expected
    return (
        joined.crossJoin(F.broadcast(total))
        .select(
            "digit",
            "n",
            F.round(share, 6).alias("share"),
            F.round(expected, 6).alias("expected"),
            F.round(chi2, 6).alias("chi2_term"),
        )
        .orderBy("digit")
    )
