"""Distribution analytics: exact global quantiles and robust (median/MAD)
outlier detection.

Beyond-reference extension (the reference engine has no expression layer —
SURVEY §2.8; Hive-on-Tez users get percentile_approx from Hive). These are
the distribution passes a training-data pipeline runs to pick length /
quality thresholds and to flag anomalous groups, built to stay exact at
100 TB:

- `exact_quantiles` never sorts globally and never funnels rows through
  one task: it aggregates to distinct values (map-side combine), takes a
  distributed prefix sum of the counts (`operators/sort.prefix_sum`, the
  two-job range-partition + offset shape), and probes the handful of
  target positions with a broadcast theta-join. Shuffle volume is
  O(|distinct values|), not O(rows).
- `robust_outliers` keeps everything keyed by the group column: two
  grouped exact-percentile aggregations (Spark's JVM-side `percentile`,
  exact with linear interpolation — each GROUP's values must fit an
  executor, the usual bound for any exact per-group statistic) and two
  joins against group-stat tables that are |groups| rows (AQE broadcasts
  them without hints).
"""

from __future__ import annotations

import math

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hdp_tez_spark.plans.checkpoints import truncate_lineage

from hdp_tez_spark.operators.sort import prefix_sum


def exact_quantiles(
    df: DataFrame, value_col: str, probs: Sequence[float]
) -> DataFrame:
    """EXACT percentile_cont(p) for each p in `probs` over the whole
    input, with linear interpolation between adjacent order statistics —
    identical semantics to SQL PERCENTILE_CONT / DuckDB quantile_cont.

    Output: (p, q) — one row per requested quantile, q rounded to 6 dp.

    How it scales: the value column is first collapsed to
    (value, count) — one shuffle whose volume is the number of DISTINCT
    values (map-side partial agg does the heavy lifting). A distributed
    prefix sum over value order turns counts into position ranges
    [hi-cnt+1, hi]; the total lands on the driver as ONE scalar (the
    same bounded-aggregate class as k-means centroids), the 2|probs|
    target positions 1 + p*(n-1) become a literal probe array, and the
    hits are a pure map-side filter over the distinct values. No global
    sort, no single-task window, no row-proportional driver state.
    (r10: the probe used to be an in-plan broadcast-nested-loop range
    join — 64 zero-byte tasks burning 16 exec-seconds at sf0.1 plus a
    ~10-stage broadcast dance, all to avoid collecting one long.)

    Eager-at-construction contract (ADVICE r10): CONSTRUCTING this
    DataFrame runs blocking Spark jobs (the prefix-sum cut + the one-
    scalar total) — the returned frame is no longer fully lazy, and the
    localCheckpoint cut is not fault-tolerant without a configured
    checkpoint dir. Same contract class as the k-means centroid
    collect.
    """
    if not probs:
        raise ValueError("probs must be non-empty")
    for p in probs:
        if not 0.0 <= p <= 1.0:
            raise ValueError(f"prob out of [0,1]: {p}")

    v = F.col(value_col).cast("double").alias("__v")
    counts = df.select(v).groupBy("__v").agg(F.count(F.lit(1)).alias("__cnt"))
    # Materialize the cumulated distinct-value table once: it feeds the
    # total AND the probe filter, and without truncation each consumer
    # would re-scan the fact table. |distinct| rows — bounded by the
    # value domain, not the corpus; truncate_lineage upgrades to a
    # reliable checkpoint when the SparkContext has a checkpoint dir
    # configured (plans/checkpoints.py).
    cum = prefix_sum(counts, [F.col("__v")], "__cnt", "__hi").transform(truncate_lineage)
    n = cum.groupBy().agg(F.sum("__cnt").alias("__n")).first()["__n"]

    spark = df.sparkSession
    if n is None:  # empty input: no order statistics to probe
        return spark.createDataFrame([], "p double, q double")
    # same arithmetic the in-plan targets computed: t = 1 + p*(n-1) in
    # IEEE doubles, floor/ceil split, frac = t - floor(t)
    entries = []
    for p in probs:
        t = 1.0 + float(p) * (n - 1)
        frac = t - math.floor(t)
        for pos, side in ((math.floor(t), "lo"), (math.ceil(t), "hi")):
            entries.append(
                F.struct(
                    F.lit(float(p)).alias("p"),
                    F.lit(frac).alias("__frac"),
                    F.lit(int(pos)).cast("long").alias("__pos"),
                    F.lit(side).alias("__side"),
                )
            )
    probe = F.array(*entries)
    # each distinct value covers global positions [hi-cnt+1, hi]; keep
    # the probe entries that land inside — a map-side filter + explode
    # of <= 2|probs| literal structs per row, no join
    hits = (
        cum.select(
            "__v",
            F.explode(
                F.filter(
                    probe,
                    lambda e: (e["__pos"] >= F.col("__hi") - F.col("__cnt") + 1)
                    & (e["__pos"] <= F.col("__hi")),
                )
            ).alias("__e"),
        )
        .select(
            F.col("__e.p").alias("p"),
            F.col("__e.__frac").alias("__frac"),
            F.col("__e.__side").alias("__side"),
            "__v",
        )
    )
    return (
        hits.groupBy("p", "__frac")
        .agg(
            F.max(F.when(F.col("__side") == "lo", F.col("__v"))).alias("__vlo"),
            F.max(F.when(F.col("__side") == "hi", F.col("__v"))).alias("__vhi"),
        )
        .select(
            "p",
            F.round(
                F.col("__vlo")
                + F.col("__frac") * (F.col("__vhi") - F.col("__vlo")),
                6,
            ).alias("q"),
        )
        .orderBy("p")
    )


def exact_quantiles_disc(
    df: DataFrame, value_col: str, probs: Sequence[float]
) -> DataFrame:
    """EXACT percentile_disc(p): the smallest actual value whose
    cumulative distribution reaches p (rank ceil(p*n), clamped to >= 1)
    — no interpolation, always a value present in the data. Same
    distributed shape as `exact_quantiles` (distinct-collapse, prefix
    sum, broadcast position probe; shuffle is O(|distinct|)), but each p
    probes ONE order statistic. Output: (p, q) rounded to 6 dp.
    """
    if not probs:
        raise ValueError("probs must be non-empty")
    for p in probs:
        if not 0.0 <= p <= 1.0:
            raise ValueError(f"prob out of [0,1]: {p}")
    v = F.col(value_col).cast("double").alias("__v")
    counts = df.select(v).groupBy("__v").agg(F.count(F.lit(1)).alias("__cnt"))
    cum = prefix_sum(counts, [F.col("__v")], "__cnt", "__hi").transform(truncate_lineage)
    n = cum.groupBy().agg(F.sum("__cnt").alias("__n")).first()["__n"]
    spark = df.sparkSession
    if n is None:  # empty input
        return spark.createDataFrame([], "p double, q double")
    # scalar-n probe, same rewrite as exact_quantiles (r10): rank
    # ceil(p*n) clamped to >= 1 as literal positions, matched map-side
    entries = [
        F.struct(
            F.lit(float(p)).alias("p"),
            F.lit(int(max(1, math.ceil(float(p) * n)))).cast("long").alias(
                "__pos"
            ),
        )
        for p in probs
    ]
    hits = cum.select(
        "__v",
        F.explode(
            F.filter(
                F.array(*entries),
                lambda e: (e["__pos"] >= F.col("__hi") - F.col("__cnt") + 1)
                & (e["__pos"] <= F.col("__hi")),
            )
        ).alias("__e"),
    ).select(F.col("__e.p").alias("p"), "__v")
    return hits.select("p", F.round("__v", 6).alias("q")).orderBy("p")


def robust_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    n_sigmas: float = 3.0,
) -> DataFrame:
    """Per-group robust outlier stats via median / MAD (median absolute
    deviation): a value is an outlier when
    |x - median| > n_sigmas * 1.4826 * MAD (1.4826 makes MAD a consistent
    sigma estimator under normality). Median/MAD resist the heavy tails
    that wreck mean/stddev z-scores on real corpus stats.

    Output: (group, n, n_outliers, med, mad) — med/mad rounded to 6 dp.
    A group with MAD = 0 (majority of values identical) flags every value
    strictly different from the median, the standard degenerate-MAD rule.

    Scale: two grouped EXACT percentile aggregations (JVM-side
    `percentile`; per-group values must fit an executor — the same bound
    as any exact per-group statistic) plus two joins against |groups|-row
    stat tables, which AQE broadcasts unhinted. Nothing global, nothing
    driver-side.
    """
    g = F.col(group_col)
    x = F.col(value_col).cast("double")
    med = df.groupBy(group_col).agg(
        F.percentile(x, F.lit(0.5)).alias("med")
    )
    dev = df.select(g.alias(group_col), x.alias("__x")).join(med, group_col)
    stats = (
        dev.withColumn("__absdev", F.abs(F.col("__x") - F.col("med")))
        .groupBy(group_col)
        .agg(
            F.percentile(F.col("__absdev"), F.lit(0.5)).alias("mad"),
            F.first("med").alias("med"),
        )
    )
    flagged = (
        dev.join(stats.select(group_col, "mad"), group_col)
        .withColumn(
            "__is_out",
            (
                F.abs(F.col("__x") - F.col("med"))
                > n_sigmas * 1.4826 * F.col("mad")
            ).cast("int"),
        )
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("__is_out").alias("n_outliers"),
        )
    )
    return (
        flagged.join(stats, group_col)
        .select(
            group_col,
            "n",
            "n_outliers",
            F.round("med", 6).alias("med"),
            F.round("mad", 6).alias("mad"),
        )
        .orderBy(group_col)
    )


def gap_fill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step_seconds: int = 3600,
) -> DataFrame:
    """Time-series resample + forward fill: bucket each key's events onto
    a regular `step_seconds` grid spanning [min bucket, max bucket] of
    that key, sum the value per bucket, and fill empty buckets with the
    last observed bucket sum (classic LOCF gap fill — the resample every
    feature/metrics pipeline runs before a rolling computation).

    Output: (key, bucket, val, is_gap) — bucket as epoch seconds,
    val rounded to 4 dp, is_gap = 1 where the bucket had no events.

    Scale shape: events collapse to per-(key, bucket) sums first (one
    partially-aggregated shuffle, the only pass over the raw data); the
    grid is generated map-side with sequence()+explode from the |keys|-row
    span table — grid size is span/step per key, independent of event
    count; the fill is one window over the grid keyed like the join, so
    the whole chain rides a single partitioning. Nothing is collected;
    no per-row Python.
    """
    if step_seconds <= 0:
        raise ValueError(f"step_seconds must be positive, got {step_seconds}")
    k = F.col(key_col)
    bucket = (
        F.floor(F.unix_timestamp(F.col(ts_col)) / step_seconds) * step_seconds
    ).cast("long")
    per_bucket = (
        df.select(k.alias("key"), bucket.alias("bucket"), F.col(value_col).alias("__v"))
        .groupBy("key", "bucket")
        .agg(F.round(F.sum("__v"), 4).alias("__val"))
    )
    span = per_bucket.groupBy("key").agg(
        F.min("bucket").alias("__lo"), F.max("bucket").alias("__hi")
    )
    grid = span.select(
        "key",
        F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"), F.lit(int(step_seconds)))
        ).alias("bucket"),
    )
    filled = grid.join(per_bucket, ["key", "bucket"], "left")
    w = (
        Window.partitionBy("key")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return filled.select(
        F.col("key").alias(key_col),
        "bucket",
        F.last("__val", ignorenulls=True).over(w).alias("val"),
        F.when(F.col("__val").isNull(), F.lit(1)).otherwise(F.lit(0)).alias("is_gap"),
    )


def time_weighted_avg(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-key time-weighted average (TWAP): each observation holds from
    its timestamp until the key's next observation, and the average
    weights values by that holding duration — the right mean for
    irregularly sampled series, where the arithmetic mean over-weights
    bursts. The key's last observation bounds the window and carries no
    weight. Output: (key, twap, t_span_s) — twap rounded to 6 dp, NULL
    for keys whose observations all share one timestamp; t_span_s is the
    observed window in seconds.

    Determinism: rows tied on the timestamp get their ordering from
    `tiebreak_cols`; a tied run contributes zero duration EXCEPT its
    last element, so the tiebreak decides which value carries forward —
    pass the same tiebreak to any other engine to reproduce the result.

    Scale shape: one shuffle on the key for the lead() window, then a
    partially-aggregated per-key sum — the same single-sort-run shape as
    sessionize; nothing global, no Python.
    """
    # cast, not unix_timestamp: keeps sub-second precision (epoch() parity)
    t = F.col(ts_col).cast("double")
    staged = df.select(
        F.col(key_col),
        F.col(value_col).cast("double").alias("__v"),
        t.alias("__t"),
        *[F.col(c) for c in tiebreak_cols],
    )
    w = Window.partitionBy(key_col).orderBy(
        "__t", *[F.col(c) for c in tiebreak_cols]
    )
    staged = staged.withColumn("__dt", F.lead("__t").over(w) - F.col("__t"))
    return (
        staged.groupBy(key_col)
        .agg(
            F.round(
                F.sum(F.col("__v") * F.col("__dt"))
                / F.nullif(F.sum("__dt"), F.lit(0.0)),
                6,
            ).alias("twap"),
            # floor before the integer cast: Spark's double->long cast
            # truncates but other engines round — floor is portable
            F.floor(F.max("__t") - F.min("__t")).cast("long").alias("t_span_s"),
        )
        .orderBy(key_col)
    )


def ewma_smooth(
    df: DataFrame,
    key_col: str,
    order_col: str | Sequence[str],
    value_col: str,
    alpha: float = 0.3,
    k: int = 8,
) -> DataFrame:
    """Per-key exponentially weighted moving average over the trailing
    `k` observations (the newest inclusive), normalized over the weights
    actually present:

        ewma_t = sum_{j=0..k-1} (1-a)^j * x_{t-j} / sum_{j present} (1-a)^j

    The bounded-window formulation is deliberate: the textbook recursive
    EWMA (y_t = a*x_t + (1-a)*y_{t-1}) is a sequential scan — on Spark
    that's either a driver loop or a numerically explosive closed form
    ((1-a)^(-i) overflows for long series). Truncating at k terms keeps
    every weight in [(1-a)^(k-1), 1], makes the result an exact, finite
    column expression, and loses at most (1-a)^k of the mass (<0.6% for
    the defaults a=0.3, k=8).

    Output: (key, order, value, ewma) — ewma rounded to 6 dp.

    Scale shape: ONE window sort per key drives all k lag() terms (a
    single shuffle + one in-partition sort run, exactly the secondary-
    sort primitive, SURVEY §2.5); the smoothing itself is a fixed-size
    JVM expression tree — zero Python, zero extra shuffles, memory
    independent of series length.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError("alpha must be in (0, 1]")
    if k < 1:
        raise ValueError("k must be >= 1")
    # accept one column or a list — pass a tiebreaker when the primary
    # order can collide, or lag() visits tied rows in an engine-chosen
    # order and the result is retry-nondeterministic
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    w = Window.partitionBy(key_col).orderBy(*[F.col(c) for c in order_cols])
    v = F.col(value_col).cast("double")
    lags = [F.lag(v, j).over(w) if j else v for j in range(k)]
    weights = [(1.0 - alpha) ** j for j in range(k)]
    num = sum(
        (F.when(lg.isNotNull(), lg * F.lit(wt)).otherwise(F.lit(0.0)) for lg, wt in zip(lags, weights)),
        F.lit(0.0),
    )
    den = sum(
        (F.when(lg.isNotNull(), F.lit(wt)).otherwise(F.lit(0.0)) for lg, wt in zip(lags, weights)),
        F.lit(0.0),
    )
    return df.select(
        F.col(key_col),
        *[F.col(c) for c in order_cols],
        F.col(value_col),
        F.round(num / den, 6).alias("ewma"),
    )


def gaps_and_islands(
    df: DataFrame,
    key_col: str,
    seq_col: str,
) -> DataFrame:
    """Collapse each key's integer sequence values into maximal
    contiguous runs ("islands") — the classic gaps-and-islands idiom
    behind missing-id detection, outage-window reconstruction, and
    contiguity audits. Output: (key, island_start, island_end, n_values)
    — one row per run; a gap is the space between consecutive islands.

    The trick is pure window algebra: within a key, `seq - row_number()`
    is constant exactly along a contiguous run, so grouping by that
    anchor collapses each island with an ordinary aggregation — no
    iteration, no self-join.

    Scale shape: one shuffle on the key (window sort), then a grouped
    aggregation that reuses the same partitioning (Catalyst collapses
    the second exchange). Duplicate sequence values within a key must
    be deduplicated upstream — row_number over duplicates would split
    runs nondeterministically, so this operator distincts (key, seq)
    first and documents it.
    """
    d = df.select(
        F.col(key_col).alias("__k"), F.col(seq_col).cast("long").alias("__s")
    ).distinct()
    w = Window.partitionBy("__k").orderBy("__s")
    anchored = d.withColumn("__anchor", F.col("__s") - F.row_number().over(w))
    return (
        anchored.groupBy("__k", "__anchor")
        .agg(
            F.min("__s").alias("island_start"),
            F.max("__s").alias("island_end"),
            F.count(F.lit(1)).alias("n_values"),
        )
        .select(
            F.col("__k").alias(key_col), "island_start", "island_end", "n_values"
        )
        .orderBy(key_col, "island_start")
    )


def winsorize(
    df: DataFrame,
    key_col: str,
    value_col: str,
    lower: float = 0.05,
    upper: float = 0.95,
) -> DataFrame:
    """Per-key winsorization: clip `value_col` to that key's [lower,
    upper] exact percentiles — the standard outlier-taming transform
    before averaging heavy-tailed metrics. Returns the input rows with
    a `clipped` column (original order-agnostic).

    Scale shape: one grouped exact-percentile aggregation produces a
    |keys|-row bounds table (Spark's percentile() is a single-pass
    grouped aggregate); the bounds broadcast-join back onto the rows
    and the clip is a pure column expression. Raw rows are scanned
    twice but shuffled only once (the percentile agg); the join side is
    |keys| rows, never the data.
    """
    v = F.col(value_col).cast("double")
    # Column-object percentile, not an F.expr f-string: interpolating the
    # raw column name breaks on non-identifier names and invites injection
    bounds = df.groupBy(key_col).agg(
        F.percentile(v, F.lit(lower)).alias("__lo"),
        F.percentile(v, F.lit(upper)).alias("__hi"),
    )
    return (
        df.join(F.broadcast(bounds), key_col)
        .withColumn(
            "clipped", F.least(F.greatest(v, F.col("__lo")), F.col("__hi"))
        )
        .drop("__lo", "__hi")
    )


def rolling_zscore(
    df: DataFrame,
    key_col: str,
    order_cols: Sequence[str],
    value_col: str,
    k: int = 20,
    min_periods: int = 5,
) -> DataFrame:
    """Trailing-window anomaly score per key: how many standard
    deviations the current value sits from the mean of the PREVIOUS `k`
    observations (current row excluded, so a spike can't dilute its own
    baseline — the control-chart convention). Rows with fewer than
    `min_periods` predecessors, or a degenerate (zero-variance)
    baseline, score NULL.

    Output: (key, order..., value, zscore) — zscore rounded to 6 dp.

    Scale shape: one shuffle on the key drives a single window sort;
    mean and variance come from two frame aggregates (Σx, Σx²) over the
    same rows-frame, var = E[x²] − E[x]² clamped at 0 against float
    cancellation. Pure JVM expressions, memory independent of series
    length — the streaming-friendly baseline formulation.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(-k, -1)
    )
    v = F.col(value_col).cast("double")
    n = F.count(v).over(w)
    mean = F.avg(v).over(w)
    var = F.greatest(F.avg(v * v).over(w) - mean * mean, F.lit(0.0))
    z = F.when(
        (n >= min_periods) & (var > 0), (v - mean) / F.sqrt(var)
    )
    return df.select(
        F.col(key_col),
        *[F.col(c) for c in order_cols],
        F.col(value_col),
        F.round(z, 6).alias("zscore"),
    )


def rolling_median(
    df: DataFrame,
    key_col: str,
    order_cols: Sequence[str],
    value_col: str,
    k: int = 7,
    min_periods: int = 1,
) -> DataFrame:
    """Exact trailing-window median per key over the current row and the
    previous `k - 1` observations — the robust counterpart of a moving
    average (one spike moves a 7-point mean by spike/7 but usually moves
    the median not at all), the standard smoother for noisy per-key
    telemetry before thresholding. Linear interpolation at even counts
    (percentile_cont semantics — identical in Spark's `percentile` and
    DuckDB's `median`). Rows with fewer than `min_periods` frame rows
    get NULL.

    Output: (key, order..., value, rolling_median) — median rounded to
    6 dp (interpolation midpoints are exact binary halves of in-frame
    values, so the rounding is decoration, not noise control).

    Scale shape: one shuffle on the key drives a single window sort; the
    frame holds at most `k` rows per evaluation, so memory is O(k) per
    task regardless of series length, and the whole expression stays
    JVM-side (no Pandas hop). Same envelope as `rolling_zscore`.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(-(k - 1), 0)
    )
    v = F.col(value_col).cast("double")
    med = F.percentile(v, F.lit(0.5)).over(w)
    n = F.count(v).over(w)
    return df.select(
        F.col(key_col),
        *[F.col(c) for c in order_cols],
        F.col(value_col),
        F.round(F.when(n >= min_periods, med), 6).alias("rolling_median"),
    )


def seasonal_decompose(
    series: DataFrame,
    ts_col: str,
    value_col: str,
    period: int = 7,
) -> DataFrame:
    """Classical additive seasonal decomposition of a daily series:
    observed = trend + seasonal + residual, with

    - trend    = centered `period`-point moving average (NULL at the
      edges where the window is not full — the textbook convention, so
      the trend never leans on a one-sided window);
    - seasonal = mean detrended value per position-in-period
      (day-of-week for the default period=7), re-centered to sum to
      zero across positions so the trend keeps the level;
    - residual = observed - trend - seasonal.

    Output: (ts, pos, observed, trend, seasonal, residual) — floats
    rounded to 6 dp. `pos` is 0-based position in the period
    (0 = Sunday for day inputs, matching DuckDB's dayofweek).

    Scale shape: the input is a PRE-AGGREGATED series, one row per
    bucket — calendar-bounded (ten years of days is 3.7k rows), never
    data-sized, and assumed GAPLESS (run `gap_fill` first for sparse
    series: the centered window is rows-based, not calendar-based).
    The global ORDER BY window over it is therefore a
    bounded single-task sort by design (plan-lint allowlisted with this
    reason). The per-position seasonal means are a |period|-row table,
    broadcast back. The data-sized work (aggregating raw events into
    the series) happens upstream where it shuffles once on the bucket.
    """
    o = F.col(value_col).cast("double")
    pos = (F.dayofweek(F.col(ts_col)) - F.lit(1)).alias("pos")
    w = Window.orderBy(ts_col).rowsBetween(
        -(period // 2), period - 1 - period // 2
    )
    base = series.select(
        F.col(ts_col).alias("ts"),
        pos,
        o.alias("observed"),
        F.when(F.count(o).over(w) == period, F.avg(o).over(w)).alias(
            "trend"
        ),
    )
    season = (
        base.where(F.col("trend").isNotNull())
        .groupBy("pos")
        .agg(F.avg(F.col("observed") - F.col("trend")).alias("__raw_s"))
    )
    # re-center so seasonal sums to zero over the period (level stays
    # in the trend); __raw_s is a <= period-row table, broadcast join
    centered = season.crossJoin(
        season.select(F.avg("__raw_s").alias("__mean_s"))
    ).select(
        "pos", (F.col("__raw_s") - F.col("__mean_s")).alias("__s")
    )
    return (
        base.join(F.broadcast(centered), "pos", "left")
        .select(
            "ts",
            "pos",
            F.round("observed", 6).alias("observed"),
            F.round("trend", 6).alias("trend"),
            F.round("__s", 6).alias("seasonal"),
            F.round(
                F.col("observed") - F.col("trend") - F.col("__s"), 6
            ).alias("residual"),
        )
    )


def pareto_contributors(
    df: DataFrame,
    group_col: str,
    key_col: str,
    value_col: str,
    threshold_num: int = 4,
    threshold_den: int = 5,
) -> DataFrame:
    """Contribution analysis (the 80/20 readout): within each group,
    rank keys by value descending and keep the smallest prefix whose
    cumulative share reaches `threshold_num / threshold_den` (default
    4/5 = 80%) — every row BEFORE the crossing plus the crossing row
    itself. The classic "which customers are 80% of revenue" /
    "which domains are 80% of tokens" cut for curation and capacity
    decisions.

    Output: (group, key, value, rank, share, cum_share) — share ratios
    rounded to 6 dp.

    Determinism contract: `value_col` should be an exact type (DECIMAL
    money sums, bigint counts). The keep/drop decision is then an EXACT
    integer-scaled comparison — (cum - value) * den < total * num in
    the value's own exact arithmetic — never a float threshold, so no
    row flips membership at a rounding boundary (the r07 tpch_q1 bug
    class). Ties rank by ascending key.

    Scale shape: one shuffle on the group drives both window passes
    (rank/cumsum and the group total share the partitioning); no
    global window, no driver state. Output is the contributor prefix —
    data-sized in the worst case, like any filter.
    """
    v = F.col(value_col)
    w = Window.partitionBy(group_col).orderBy(
        F.desc(value_col), F.col(key_col)
    )
    wg = Window.partitionBy(group_col)
    cum = F.sum(v).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    total = F.sum(v).over(wg)
    keep = (cum - v) * F.lit(threshold_den) < total * F.lit(threshold_num)
    return (
        df.select(
            F.col(group_col),
            F.col(key_col),
            v.alias("value"),
            F.row_number().over(w).alias("rank"),
            F.round(
                v.cast("double") / total.cast("double"), 6
            ).alias("share"),
            F.round(
                cum.cast("double") / total.cast("double"), 6
            ).alias("cum_share"),
            keep.alias("__keep"),
        )
        .where(F.col("__keep"))
        .drop("__keep")
    )


def ohlc_downsample(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    bucket: str,
    tiebreak_col: str,
) -> DataFrame:
    """Open/high/low/close downsampling: collapse an irregular per-key
    series into fixed time buckets with the bucket's first value (open),
    extrema (high/low), last value (close), count, and mean — the
    resolution-reduction step that turns a 100 TB tick table into a
    queryable bar table.

    Output: (key, bucket_start, open, high, low, close, n, mean).

    Determinism: open/close are `min_by`/`max_by` keyed on
    (ts, tiebreak), so timestamp ties resolve identically on every
    engine and every retry.

    Scale shape: a single grouped aggregation — map-side partial
    min_by/max_by/min/max/sum (all algebraic), one shuffle carrying
    |key x bucket| rows. No window sort: min_by subsumes the
    first/last-value window at a fraction of the cost (no per-partition
    ordering pass, and partials merge associatively).
    """
    b = F.window(F.col(ts_col), bucket)["start"].alias("bucket_start")
    order = F.struct(F.col(ts_col), F.col(tiebreak_col))
    v = F.col(value_col).cast("double")
    return (
        df.groupBy(F.col(key_col), b)
        .agg(
            F.min_by(v, order).alias("open"),
            F.max(v).alias("high"),
            F.min(v).alias("low"),
            F.max_by(v, order).alias("close"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg(v), 6).alias("mean"),
        )
        .orderBy(key_col, "bucket_start")
    )


def grouped_ols(
    df: DataFrame,
    key_cols: Sequence[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-key simple linear regression (ordinary least squares) in
    closed form: one partially-aggregated pass computes the sufficient
    statistics (n, Σx, Σy, Σxy, Σx²) and the slope/intercept fall out as
    column arithmetic — thousands of independent model fits in a single
    shuffle whose volume is |keys|, the distributed twin of
    `GROUP BY ... regr_slope(...)`.

    Output: (keys..., n, slope, intercept) rounded to 6 dp; slope NULL
    for degenerate keys (all x equal, or a single row).

    Scale: the same shape as any grouped aggregation — map-side partial
    sums, |keys|-row shuffle, zero Python, no per-key iteration. The
    closed form trades one pass for the cancellation hazard of
    (nΣxy - ΣxΣy) on badly-scaled data; center x upstream if its mean
    is huge relative to its spread.
    """
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    # complete pairs only: per-column null-skipping would draw each sum
    # from a different row subset and the closed form would combine them
    # into an arbitrary number instead of a fit
    df = df.where(x.isNotNull() & y.isNotNull())
    stats = df.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("__sx"),
        F.sum(y).alias("__sy"),
        F.sum(x * y).alias("__sxy"),
        F.sum(x * x).alias("__sxx"),
    )
    den = stats["n"] * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    slope = F.when(
        den != 0.0,
        (stats["n"] * F.col("__sxy") - F.col("__sx") * F.col("__sy")) / den,
    )
    return stats.select(
        *key_cols,
        "n",
        F.round(slope, 6).alias("slope"),
        F.round((F.col("__sy") - slope * F.col("__sx")) / stats["n"], 6).alias(
            "intercept"
        ),
    ).orderBy(*key_cols)


def binary_auc(df: DataFrame, score_col: str, label_col: str) -> DataFrame:
    """Exact ROC AUC of a binary classifier from (score, 0/1 label)
    columns, at any scale, via the rank-sum (Mann-Whitney U) identity:

        AUC = (Σ_{positives} avg_rank - P(P+1)/2) / (P * N)

    with ties resolved by average ranks — the standard definition.

    Scale shape: scores first collapse to DISTINCT values with (count,
    positive-count) — the only pass over raw rows, a partial-aggregated
    groupBy. Average ranks come from the distributed prefix sum over the
    distinct-score table (range partition + broadcast offsets,
    operators/sort.prefix_sum) — never a single-task global window. The
    rank arithmetic is exact (integer counts and halves are exact in
    doubles up to 2^53), so the result is bit-stable across engines.

    Output: one row (n_pos, n_neg, auc), auc rounded to 6 dp and NULL
    when a class is absent.
    """
    from hdp_tez_spark.operators.sort import prefix_sum

    g = (
        df.select(
            F.col(score_col).alias("__score"),
            F.col(label_col).cast("long").alias("__y"),
        )
        .groupBy("__score")
        .agg(F.count(F.lit(1)).alias("__cnt"), F.sum("__y").alias("__pos"))
        # three consumers (prefix_sum reads it twice, totals once) —
        # checkpoint the |distinct scores|-row table so the raw input is
        # scanned exactly once
        .transform(truncate_lineage)
    )
    ranked = prefix_sum(g, [F.col("__score")], "__cnt", out="__cum").select(
        "__pos",
        (
            F.col("__cum") - F.col("__cnt") + (F.col("__cnt") + F.lit(1)) / 2.0
        ).alias("__avg_rank"),
    )
    agg = ranked.agg(
        F.sum(F.col("__pos") * F.col("__avg_rank")).alias("__prs"),
        F.sum("__pos").alias("__p"),
    )
    totals = g.agg(F.sum("__cnt").alias("__t"))
    out = agg.crossJoin(F.broadcast(totals))
    p = F.col("__p")
    n = F.col("__t") - p
    return out.select(
        p.alias("n_pos"),
        n.alias("n_neg"),
        F.round(
            F.when(
                (p > 0) & (n > 0),
                (F.col("__prs") - p * (p + 1) / 2.0) / (p * n),
            ),
            6,
        ).alias("auc"),
    )


def transition_counts(
    df: DataFrame,
    key_col: str,
    order_cols: Sequence[str],
    state_col: str,
) -> DataFrame:
    """First-order (Markov) transition counts over per-key ordered state
    sequences: one output row per observed (src_state, dst_state) pair
    with its global count — the sequence-mining primitive behind
    clickstream path analysis and behavioral next-event models.

    Each key's events are ordered by `order_cols` (include a unique
    tiebreaker for determinism); consecutive pairs within a key count
    one transition; the first event of a key has no predecessor and
    contributes nothing.

    Scale shape: one shuffle on the key for the lag() window (the
    secondary-sort primitive), then a partial-aggregated groupBy on
    (src, dst) — shuffle volume is |state-pairs| (tiny: |states|^2
    upper bound), not |events|. Zero Python, two exchanges total.
    """
    w = Window.partitionBy(key_col).orderBy(*[F.col(c) for c in order_cols])
    return (
        df.select(
            F.lag(state_col).over(w).alias("src_state"),
            F.col(state_col).alias("dst_state"),
        )
        .where(F.col("src_state").isNotNull())
        .groupBy("src_state", "dst_state")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
        .orderBy("src_state", "dst_state")
    )


def cohort_retention(
    df: DataFrame,
    user_col: str,
    ts_col: str,
) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity day
    (their cohort), counted on each later activity day as an offset from
    the cohort day. Output: (cohort_day, day_offset, n_users) — the
    day-0 row is the cohort size, and n_users at offset k is how many of
    that cohort were active k days later.

    Scale shape: activity first collapses to distinct (user, day) — one
    partially-aggregated shuffle, and the only pass over raw events; the
    first-seen table is |users| rows and joins back keyed on the user
    (AQE sizes it); the final (cohort, offset) aggregate is |days|^2/2
    rows at most. Nothing global, nothing collected, no window over
    event history.
    """
    day = F.to_date(F.col(ts_col))
    activity = (
        df.select(F.col(user_col).alias("__u"), day.alias("__d")).distinct()
    )
    firsts = activity.groupBy("__u").agg(F.min("__d").alias("__cohort"))
    return (
        activity.join(firsts, "__u")
        .groupBy(
            F.col("__cohort").alias("cohort_day"),
            F.datediff(F.col("__d"), F.col("__cohort")).alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_day", "day_offset")
    )


def funnel(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    stages: Sequence[str],
) -> DataFrame:
    """Ordered-sequence funnel: how many users reach each stage, where a
    user completes stage i only with an event of type ``stages[i]``
    STRICTLY AFTER their stage-(i-1) completion time. Uses earliest-time
    chaining (greedy-earliest is optimal: taking the minimal completion
    time at each stage maximizes the window for the next), so the whole
    funnel is |stages|-1 equi-joins + per-user min aggregations — no
    per-user sequence materialization, no window over full event history.

    Scale shape: every stage aggregates and joins hash-partitioned on the
    user key, so AQE reuses one exchange layout across stages, and each
    stage's frame only shrinks (monotone conversion). Output:
    (stage_idx, stage, n_users), one row per stage.
    """
    if not stages:
        raise ValueError("funnel needs at least one stage")
    cur = (
        df.where(F.col(type_col) == stages[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("__t"))
    )
    outs = [
        cur.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(0).alias("stage_idx"), F.lit(stages[0]).alias("stage"), "n_users"
        )
    ]
    for i, st in enumerate(stages[1:], start=1):
        nxt = df.where(F.col(type_col) == st).select(
            user_col, F.col(ts_col).alias("__ts")
        )
        cur = (
            nxt.join(cur, user_col)
            .where(F.col("__ts") > F.col("__t"))
            .groupBy(user_col)
            .agg(F.min("__ts").alias("__t"))
        )
        outs.append(
            cur.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(i).alias("stage_idx"), F.lit(st).alias("stage"), "n_users"
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def woe_iv(
    df: DataFrame,
    feature_col: str,
    label_col,
    smooth: float = 0.5,
) -> DataFrame:
    """Weight-of-evidence encoding + information value for a categorical
    feature against a binary target — the feature-screening pass a
    training pipeline runs to rank candidate features (IV > 0.3 ~=
    strong) and to replace high-cardinality categories with a single
    monotone numeric column. `label_col` may be a column name or a
    boolean Column expression; truthy rows are the positive class.

    Per category: woe = ln( ((pos_i + s) / (pos_tot + 2s)) /
    ((neg_i + s) / (neg_tot + 2s)) ) with Laplace smoothing `s` so
    one-sided categories stay finite; iv_contrib = (smoothed pos share -
    smoothed neg share) * woe, so the feature's IV is sum(iv_contrib).
    Output: (category as string, n, n_pos, n_neg, woe, iv_contrib)
    ordered by category, both metrics rounded to 6 dp.

    Scale shape: one partially-aggregated groupBy (shuffle ∝
    |categories|), then the 1-row totals join back as a broadcast cross
    join — the `key_skew_stats` cost profile. The encoded table is
    |categories| rows: broadcastable back onto the corpus as the
    WoE-encoding map join.
    """
    if smooth <= 0:
        raise ValueError(f"smooth must be positive, got {smooth}")
    lab = F.col(label_col) if isinstance(label_col, str) else label_col
    pos = lab.cast("boolean").cast("long")
    cats = df.groupBy(F.col(feature_col).cast("string").alias("category")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(pos).alias("n_pos"),
        (F.count(F.lit(1)) - F.sum(pos)).alias("n_neg"),
    )
    tot = cats.agg(
        F.sum("n_pos").alias("__pt"), F.sum("n_neg").alias("__nt")
    )
    ps = (F.col("n_pos") + smooth) / (F.col("__pt") + 2 * smooth)
    ns = (F.col("n_neg") + smooth) / (F.col("__nt") + 2 * smooth)
    return (
        cats.crossJoin(F.broadcast(tot))
        .select(
            "category",
            "n",
            "n_pos",
            "n_neg",
            F.round(F.log(ps / ns), 6).alias("woe"),
            F.round((ps - ns) * F.log(ps / ns), 6).alias("iv_contrib"),
        )
        .orderBy("category")
    )


def attribute_conversions(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    id_col: str,
    conversion_type: str,
    touch_types: Sequence[str],
    value_col: str | None = None,
) -> DataFrame:
    """First/last-touch attribution: for every conversion event, find
    the earliest and latest preceding touch event by the same user —
    the credit-assignment readout behind every marketing/funnel
    dashboard. Output per conversion: (id, user, conv_ts, [value,]
    first_touch, first_ts, last_touch, last_ts), timestamps as epoch
    seconds rounded to 6 dp; touch columns are NULL for a conversion
    with no prior touch.

    Scale shape: ONE keyed window pass — first()/last() with
    ignorenulls over the per-user rows-preceding frame compute both
    models simultaneously, so the only shuffle is the (user) hash
    partition of the events (the sessionize shape). No self-join of
    touches x conversions, which is the quadratic trap when one user
    has thousands of events. Ties at the same timestamp are ordered by
    the event id, so attribution is retry-deterministic.
    """
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_touch = F.col(type_col).isin(list(touch_types))
    touch = F.when(
        is_touch,
        F.struct(F.col(ts_col).alias("ts"), F.col(type_col).alias("tp")),
    )
    first_t = F.first(touch, ignorenulls=True).over(w)
    last_t = F.last(touch, ignorenulls=True).over(w)
    epoch = lambda c: F.round(c.cast("double"), 6)  # noqa: E731
    cols = [
        F.col(id_col),
        F.col(user_col),
        epoch(F.col(ts_col)).alias("conv_ts"),
        *([F.col(value_col)] if value_col else []),
        F.col("__f").tp.alias("first_touch"),
        epoch(F.col("__f").ts).alias("first_ts"),
        F.col("__l").tp.alias("last_touch"),
        epoch(F.col("__l").ts).alias("last_ts"),
    ]
    return (
        df.withColumn("__f", first_t)
        .withColumn("__l", last_t)
        .where(F.col(type_col) == conversion_type)
        .select(*cols)
    )


def merge_intervals(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Union of overlapping/touching time intervals per key — the
    coverage computation behind uptime, billing-hours, and
    exposure-window readouts, where naive SUM(end - start) double-counts
    every overlap. Output per key: (key, n_raw, n_merged, covered_sec)
    with covered_sec = total length of the merged union in seconds
    (rounded to 4 dp — the sum accumulates one float difference per
    island, and at 10x volume summation-order noise flips the 6th
    decimal; 4 dp keeps >=100x headroom, per the float-summing rule).

    Scale shape: the gaps-and-islands trick in ONE keyed window pass —
    an interval starts a new island when its start exceeds the running
    max end of everything before it; islands then collapse with a
    grouped agg. Both group-bys cluster by the window's partition key,
    so Catalyst reuses the single hash exchange — one shuffle total,
    no interval self-join (the quadratic trap when one key holds
    thousands of intervals). Ties order by (start, end) and
    end-touching intervals merge, so the island assignment is
    retry-deterministic.
    """
    # An interval without both endpoints is not an interval: dropping
    # NULL rows up front also removes the engine-dependent NULL-ordering
    # edge (Spark sorts NULLS FIRST, most SQL engines NULLS LAST) from
    # the island assignment. Inverted rows (end < start) are dropped for
    # the same reason — kept, one would seed its own island with
    # NEGATIVE length and silently shrink covered_sec (e.g. [0,10] plus
    # inverted [12,8] would report 6.0 instead of 10.0).
    base = df.select(
        F.col(key_col).alias("key"),
        F.col(start_col).cast("double").alias("__s"),
        F.col(end_col).cast("double").alias("__e"),
    ).where(
        F.col("__s").isNotNull()
        & F.col("__e").isNotNull()
        & (F.col("__e") >= F.col("__s"))
    )
    s, e = F.col("__s"), F.col("__e")
    w = Window.partitionBy("key").orderBy(s, e)
    prev_max_end = F.max(e).over(w.rowsBetween(Window.unboundedPreceding, -1))
    new_island = (
        prev_max_end.isNull() | (s > prev_max_end)
    ).cast("long")
    island = F.sum(new_island).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    islands = (
        base.withColumn("__island", island)
        .groupBy("key", "__island")
        .agg(
            F.min("__s").alias("__is"),
            F.max("__e").alias("__ie"),
            F.count(F.lit(1)).alias("__cnt"),
        )
    )
    return (
        islands.groupBy("key")
        .agg(
            F.sum("__cnt").alias("n_raw"),
            F.count(F.lit(1)).alias("n_merged"),
            F.round(F.sum(F.col("__ie") - F.col("__is")), 4).alias(
                "covered_sec"
            ),
        )
        .select("key", "n_raw", "n_merged", "covered_sec")
        .orderBy("key")
    )


def rolling_active_users(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    window_days: int = 7,
) -> DataFrame:
    """Exact trailing-window distinct users per day — the WAU/MAU
    engagement readout (7-day/28-day actives), which resists window
    functions because COUNT(DISTINCT) over a moving frame is not
    decomposable. Output: (day, active_users) for every day with at
    least one event, counting users active in [day - window_days + 1,
    day].

    Scale shape: raw events collapse FIRST to distinct (day, user) —
    the only pass over the corpus, partial-agg'd — then each of those
    rows fans out to at most `window_days` spine days through a
    broadcast range join against the |days|-sized day spine, and the
    final distinct-count groups by day. Work after the collapse is
    |daily actives| x window_days, independent of raw event volume;
    nothing is ever quadratic in users or events.
    """
    if window_days <= 0:
        raise ValueError(f"window_days must be positive, got {window_days}")
    du = (
        df.select(
            F.to_date(F.col(ts_col)).alias("day"),
            F.col(user_col).alias("u"),
        )
        .where(F.col("day").isNotNull())
        .distinct()
    )
    days = du.select("day").distinct()
    return (
        F.broadcast(days.alias("d"))
        .join(
            du.alias("x"),
            (F.col("x.day") <= F.col("d.day"))
            & (F.col("x.day") >= F.date_sub(F.col("d.day"), window_days - 1)),
        )
        .groupBy(F.col("d.day").alias("day"))
        .agg(F.count_distinct(F.col("x.u")).alias("active_users"))
        .orderBy("day")
    )


def cusum_shift(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    target: float,
    slack: float = 0.0,
    threshold: float | None = None,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """One-sided CUSUM change-point statistic per key — the classic
    online monitor for an upward mean shift in a metric stream (page
    load times, error rates, token counts per doc):

        S_0 = 0;  S_n = max(0, S_{n-1} + (x_n - target - slack))

    The textbook recursion looks inherently sequential, but it has a
    closed form over prefix sums: with P_n = cumsum(x_i - target -
    slack), S_n = P_n - min(P_0, ..., P_n) (the running minimum acts as
    the last reset point). That turns CUSUM into TWO frame aggregates
    over one keyed sort — no recursion, no Python, no per-row state —
    which is why it runs at 100 TB: one hash shuffle on the key, one
    sort per key, both window functions riding the same sorted run.

    Output per row: (key, ts [, tiebreak...], value, cusum, alarm) with
    cusum rounded to 6 dp and alarm = cusum > threshold (always false
    when threshold is None). Ordered by (key, ts, tiebreak).
    """
    drift = F.col(value_col).cast("double") - target - slack
    order = [F.col(ts_col), *[F.col(c) for c in tiebreak]]
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # two selects because Spark forbids nesting a window inside a window
    # expression; both ride the SAME (partition, order) spec, so Catalyst
    # plans a single exchange + sort with two Window passes over the run
    staged = df.select(
        F.col(key_col),
        F.col(ts_col),
        *[F.col(c) for c in tiebreak],
        F.col(value_col).cast("double").alias("value"),
        F.sum(drift).over(w).alias("__p"),
    )
    # S_n = P_n - min(0, P_1..P_n): the implicit P_0 = 0 start means the
    # running min must include 0, else a series that only rises would
    # subtract its own first prefix instead of the zero start
    run_min = F.least(F.lit(0.0), F.min("__p").over(w))
    out = staged.withColumn("cusum", F.round(F.col("__p") - run_min, 6)).drop(
        "__p"
    )
    alarm = (
        (F.col("cusum") > threshold) if threshold is not None else F.lit(False)
    )
    return out.withColumn("alarm", alarm).orderBy(key_col, *order)


def acf(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    lags: Sequence[int] = (1,),
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Per-key autocorrelation at the requested lags — the
    seasonality/persistence readout that decides resampling windows and
    feature lags for a metric stream. For each lag k, Pearson
    correlation between x_t and x_{t-k} over the pairs where both
    exist (the standard sample-ACF-with-pairwise-complete convention,
    matching SQL corr() over lagged columns).

    Output: (key, lag, n_pairs, acf) — acf rounded to 6 dp, NULL when a
    key has < 2 pairs or zero variance at that lag; ordered by
    (key, lag).

    Scale shape: ONE keyed sort produces every lag column (all lag()
    calls share the window spec, so Catalyst plans a single Window
    operator), then one partial-agg groupBy computes corr for all lags
    simultaneously — cost is independent of len(lags) shuffles. Nothing
    quadratic: the naive self-join-on-(key, t-k) formulation shuffles
    the stream once per lag.
    """
    if not lags or any(k <= 0 for k in lags):
        raise ValueError(f"lags must be positive ints, got {lags}")
    order = [F.col(ts_col), *[F.col(c) for c in tiebreak]]
    w = Window.partitionBy(key_col).orderBy(*order)
    v = F.col(value_col).cast("double")
    lagged = df.select(
        F.col(key_col).alias("key"),
        v.alias("__x"),
        *[F.lag(v, k).over(w).alias(f"__l{k}") for k in lags],
    )
    aggs = []
    for k in lags:
        aggs.append(F.corr("__x", f"__l{k}").alias(f"__c{k}"))
        # pairwise-complete: a pair exists only when BOTH ends are
        # non-NULL (count of just the lag column would claim a pair for
        # a NULL x_t sitting above a real x_{t-k})
        aggs.append(
            F.count(
                F.when(
                    F.col("__x").isNotNull() & F.col(f"__l{k}").isNotNull(),
                    1,
                )
            ).alias(f"__n{k}")
        )
    stats = lagged.groupBy("key").agg(*aggs)
    per_lag = [
        stats.select(
            "key",
            F.lit(k).alias("lag"),
            F.col(f"__n{k}").alias("n_pairs"),
            F.round(F.col(f"__c{k}"), 6).alias("acf"),
        )
        for k in lags
    ]
    out = per_lag[0]
    for p in per_lag[1:]:
        out = out.unionByName(p)
    return out.orderBy("key", "lag")


def grouped_auc(
    df: DataFrame,
    group_cols: Sequence[str],
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Exact per-group ROC AUC — the segmented-evaluation / fairness
    readout (AUC per language, per source, per cohort) built on the same
    rank-sum identity as `binary_auc`:

        AUC_g = (Σ_{positives in g} avg_rank_in_g - P_g(P_g+1)/2) / (P_g N_g)

    Output per group: (group..., n_pos, n_neg, auc) — auc rounded to
    6 dp, NULL when a group lacks one of the classes; ordered by group.
    Rows with a NULL score are excluded: an unscored row is not a
    ranking data point, and keeping it would rank it at an
    engine-dependent extreme (Spark sorts NULLS FIRST, most SQL engines
    NULLS LAST), breaking the bit-stable-across-engines contract.
    Rows with a NULL label are likewise excluded — an unlabeled row is
    neither positive nor negative (counting it as negative, which
    sum-skips-NULL arithmetic would silently do, biases AUC downward);
    this mirrors binary_auc's contract.

    Scale shape: rows collapse to DISTINCT (group, score) cells with
    (count, positive-count) — the only raw-row pass. Within-group
    average ranks come from ONE keyed window cumsum over those cells
    (ordered by score), so the sort is per-group over |distinct scores
    in group| rows — not the single-task global window `binary_auc`
    avoids, because here the partition key IS the group. Rank
    arithmetic stays integer/half-exact, so results are bit-stable
    across engines.
    """
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    gs = [F.col(c) for c in group_cols]
    cells = (
        df.where(F.col(score_col).isNotNull() & F.col(label_col).isNotNull())
        .select(
            *gs,
            F.col(score_col).alias("__score"),
            F.col(label_col).cast("long").alias("__y"),
        )
        .groupBy(*group_cols, "__score")
        .agg(F.count(F.lit(1)).alias("__cnt"), F.sum("__y").alias("__pos"))
    )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("__score")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    avg_rank = (
        F.sum("__cnt").over(w)
        - F.col("__cnt")
        + (F.col("__cnt") + F.lit(1)) / 2.0
    )
    ranked = cells.withColumn("__avg_rank", avg_rank)
    agg = ranked.groupBy(*group_cols).agg(
        F.sum(F.col("__pos") * F.col("__avg_rank")).alias("__prs"),
        F.sum("__pos").alias("n_pos"),
        (F.sum("__cnt") - F.sum("__pos")).alias("n_neg"),
    )
    p, n = F.col("n_pos"), F.col("n_neg")
    return agg.select(
        *group_cols,
        "n_pos",
        "n_neg",
        F.round(
            F.when(
                (p > 0) & (n > 0),
                (F.col("__prs") - p * (p + 1) / 2.0) / (p * n),
            ),
            6,
        ).alias("auc"),
    ).orderBy(*group_cols)


def gini_coefficient(
    df: DataFrame,
    value_col: str,
) -> DataFrame:
    """Gini concentration coefficient of a non-negative measure — the
    single-number skew audit (0 = perfectly even, ->1 = one row holds
    everything) for key-skew triage, revenue concentration, and token-
    budget imbalance. Uses the exact sorted-rank identity

        G = 2 * Σ(i * x_(i)) / (n * Σx) - (n + 1) / n

    with ties handled exactly: a tie cell occupying positions lo..hi
    contributes x * cnt * (lo + hi) / 2 (the arithmetic series), which
    is rank-assignment invariant. Output: ONE row (n, gini), gini
    rounded to 6 dp and NULL when the total mass is 0 (nothing to
    concentrate). The raw total is deliberately NOT emitted: it is a
    corpus-magnitude float sum whose 6-dp rounding sits inside
    partition-order summation noise (the embedding_covariance lesson);
    the gini RATIO of two such sums has ~1e-15 relative noise and is
    safe. NULL values are excluded; negative values raise — Gini is
    undefined for signed measures.

    Scale shape: rows collapse to DISTINCT value cells (map-side
    combined, checkpointed for the two consumers), the cumulative
    positions come from the distributed `prefix_sum` (no single-task
    window), and the statistic reduces from |distinct|-cell aggregates.
    """
    from hdp_tez_spark.operators.sort import prefix_sum
    from hdp_tez_spark.plans.checkpoints import truncate_lineage

    v = F.col(value_col).cast("double")
    base = df.where(v.isNotNull()).select(v.alias("__v"))
    cells = (
        base.groupBy("__v")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .transform(truncate_lineage)
    )
    # validate on the CHECKPOINTED |distinct|-row cells, not the raw
    # corpus — the eager checkpoint just materialized them, so this
    # guard costs a metadata-sized scan instead of a second corpus pass
    if cells.where(F.col("__v") < 0).limit(1).count():
        raise ValueError(
            f"gini_coefficient requires non-negative {value_col!r}"
        )
    cum = prefix_sum(cells, [F.col("__v")], "__cnt", "__hi")
    lo = F.col("__hi") - F.col("__cnt") + 1
    ranked = cum.agg(
        F.sum(
            F.col("__v") * F.col("__cnt") * (lo + F.col("__hi")) / 2.0
        ).alias("__s")
    )
    totals = cells.agg(
        F.sum("__cnt").alias("n"),
        F.sum(F.col("__v") * F.col("__cnt")).alias("__tot"),
    )
    out = ranked.crossJoin(F.broadcast(totals))
    n = F.col("n").cast("double")
    g = 2.0 * F.col("__s") / (n * F.col("__tot")) - (n + 1.0) / n
    return out.select(
        "n",
        F.round(F.when(F.col("__tot") > 0, g), 6).alias("gini"),
    )


def skyline(
    df: DataFrame,
    minimize_col: str,
    maximize_col: str,
) -> DataFrame:
    """Two-dimensional skyline (Pareto frontier): rows not strictly
    dominated by any other row, where `b` dominates `a` iff
    b.minimize <= a.minimize AND b.maximize >= a.maximize with at least
    one strict inequality. The classic "cheapest-yet-largest" OLAP
    operator (Borzsony/Kossmann/Stocker, ICDE 2001); duplicates of a
    frontier point all survive (neither dominates the other), matching
    the NOT-EXISTS strict-dominance definition.

    To minimize (or maximize) both dimensions, negate one column first.
    Rows with NULL in either dimension are excluded — dominance is
    undefined on them.

    Scale shape — O(N log N), never the quadratic self-join: a point is
    dominated iff  max(y over points with strictly smaller x) >= its y
    OR             max(y over points with the same x)           > its y.
    Rows first collapse to one cell per distinct x (map-side combined
    groupBy carrying the per-x max of y), then the strictly-less-than
    running max comes from the same distributed exclusive scan
    `prefix_sum` uses (operators/sort.py:191): range-partition on x,
    row-framed window WITHIN each partition (parallel), plus a
    broadcast one-row-per-PARTITION offset table for the cross-
    partition prefix — no single-task global window over the distinct-x
    table, whose cardinality is data-sized at 100 TB. The final
    dominance test is an equi-join of the input back to its x-cell
    (AQE broadcasts it when the frontier's x-domain is small).
    """
    x, y = F.col(minimize_col), F.col(maximize_col)
    base = df.where(x.isNotNull() & y.isNotNull())

    cells = base.groupBy(minimize_col).agg(
        F.max(y).alias("__grp_max")
    )
    # distributed EXCLUSIVE prefix-max over cells ordered by x
    part = cells.repartitionByRange(minimize_col).withColumn(
        "__pid", F.spark_partition_id()
    )
    local_w = (
        Window.partitionBy("__pid")
        .orderBy(minimize_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    part = part.withColumn("__local_max", F.max("__grp_max").over(local_w))
    # Pin before dual reference (offsets + main join) — spark_partition_id
    # may only be read from ONE materialization (operators/sort.py r10
    # found-at-scale note); otherwise broken exchange reuse can give the
    # two sides different AQE partition counts and drop rows at the join.
    part = part.localCheckpoint(eager=False)
    offsets = part.groupBy("__pid").agg(
        F.max("__grp_max").alias("__part_max")
    )
    prev_w = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = offsets.select(
        "__pid", F.max("__part_max").over(prev_w).alias("__offset")
    )
    scanned = part.join(F.broadcast(offsets), "__pid").select(
        minimize_col,
        "__grp_max",
        F.greatest(
            # NULL-safe: greatest() ignores NULLs, yields NULL only when
            # both are NULL (the globally smallest x — nothing precedes)
            F.col("__local_max"),
            F.col("__offset"),
        ).alias("__lt_max"),
    )
    joined = base.join(scanned, on=minimize_col)
    dominated = (
        F.coalesce(F.col("__lt_max") >= y, F.lit(False))
        | (F.col("__grp_max") > y)
    )
    return joined.where(~dominated).select(*df.columns)


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 2,
    max_basket: int | None = None,
) -> DataFrame:
    """Market-basket association rules (Agrawal/Srikant's Apriori output
    at the pairwise level): for every directed item pair (antecedent ->
    consequent) co-occurring in >= min_pair_count distinct baskets,
    emit support / confidence / lift. Output: (antecedent, consequent,
    pair_n, support, confidence, lift), ratios rounded to 6 dp —
    exact-int divisions, so both engines round the same doubles.

    Scale shape: pair generation reuses graph.cooccurrence_edges —
    basket-keyed self-join (co-members only, never all-pairs across the
    item universe) with the `max_basket` sparsifier capping degenerate
    baskets BEFORE the join. Everything downstream is aggregate-sized:
    item supports are |items| rows, the basket total is a 1-row
    broadcast, and the two enrichment joins are equi-joins on item id
    that AQE broadcasts when |items| is small.
    """
    from hdp_tez_spark.extensions.graph import cooccurrence_edges

    bk = df.select(
        F.col(basket_col).alias("__b"), F.col(item_col).alias("__i")
    ).distinct()
    if max_basket is not None:
        # cap BEFORE any statistic so supports, totals and pairs all
        # describe the same (capped) basket population
        sizes = bk.groupBy("__b").agg(F.count(F.lit(1)).alias("__sz"))
        bk = bk.join(
            sizes.where(F.col("__sz") <= max_basket).select("__b"), "__b"
        )
    total = bk.agg(
        F.count_distinct(F.col("__b")).cast("double").alias("__n")
    )
    item_cnt = bk.groupBy(F.col("__i")).agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    pairs = cooccurrence_edges(bk, "__b", "__i", min_count=min_pair_count)
    directed = pairs.select(
        F.col("a").alias("antecedent"),
        F.col("b").alias("consequent"),
        F.col("n_baskets").alias("pair_n"),
    ).unionByName(
        pairs.select(
            F.col("b").alias("antecedent"),
            F.col("a").alias("consequent"),
            F.col("n_baskets").alias("pair_n"),
        )
    )
    enriched = (
        directed.join(
            item_cnt.select(
                F.col("__i").alias("antecedent"),
                F.col("__cnt").alias("__cnt_a"),
            ),
            "antecedent",
        )
        .join(
            item_cnt.select(
                F.col("__i").alias("consequent"),
                F.col("__cnt").alias("__cnt_c"),
            ),
            "consequent",
        )
        .crossJoin(F.broadcast(total))
    )
    p = F.col("pair_n").cast("double")
    return enriched.select(
        "antecedent",
        "consequent",
        "pair_n",
        F.round(p / F.col("__n"), 6).alias("support"),
        F.round(p / F.col("__cnt_a"), 6).alias("confidence"),
        F.round(
            p * F.col("__n") / (F.col("__cnt_a") * F.col("__cnt_c")), 6
        ).alias("lift"),
    )


def peak_concurrency(
    intervals: DataFrame,
    start_col: str,
    end_col: str,
    id_col: str,
    bucket: str = "day",
) -> DataFrame:
    """Sweep-line maximum overlap: for EVERY time bucket an interval
    covers, the peak number of simultaneously-active intervals and the
    earliest instant the peak is reached — max concurrent sessions /
    calls / jobs, the classic capacity-planning readout. Endpoints are
    INCLUSIVE (a zero-length interval still counts 1 at its instant):
    at equal timestamps starts order before ends, ties broken by id.
    Output: (bucket_start, peak, peak_ts) — integers and timestamps
    only, no float anywhere.

    Bucket contract (ADVICE r08): intervals are split at bucket
    boundaries before the sweep, so concurrency CARRIED into a bucket
    is represented — a bucket fully covered by an interval with no
    endpoint inside it still reports a row (its carry re-registers at
    the bucket-start instant, so an all-carry bucket reports
    peak_ts = bucket start). The peak is sampled at in-bucket event
    instants: interval starts, interval ends, and the bucket-start
    carry instants — a total order, so the answer is engine-exact.

    Scale shape: each interval explodes to 2 delta points PER COVERED
    BUCKET (calendar-bounded: a year-long interval is ~365 segment
    pairs, never data-sized); every bucket's deltas net to zero (ends
    inside the bucket, or a synthetic close at the bucket boundary), so
    one global cumulative sum — the distributed `prefix_sum` scan
    (operators/sort.py:191 — range partition on the sweep order,
    per-partition window, one-row-per-PARTITION offset broadcast) —
    yields the correct per-bucket running count with no single-task
    global window and no per-bucket repartition. The per-bucket peak is
    a map-side-combined groupBy, and the peak instant is recovered by
    one equi-join of the point list back to its bucket's peak — bucket
    cardinality is calendar-bounded.
    """
    from hdp_tez_spark.operators.sort import prefix_sum

    if bucket != "day":
        raise ValueError(f"unsupported bucket {bucket!r} (only 'day')")
    s, e, i = F.col(start_col), F.col(end_col), F.col(id_col)
    base = intervals.where(s.isNotNull() & e.isNotNull() & (s <= e))
    # one segment per (interval, covered day): start at max(s, day 00:00)
    # with ord 0; close at the real end (ord 1) when the interval ends in
    # this day, else a synthetic close at the next-day boundary (ord 2 —
    # after every in-bucket instant, so each bucket nets to zero and the
    # single global prefix_sum restarts every bucket at 0)
    seg = base.select(
        i.alias("__id"),
        s.alias("__s"),
        e.alias("__e"),
        F.explode(F.sequence(F.to_date(s), F.to_date(e))).alias("__b"),
    )
    ends_here = F.to_date("__e") == F.col("__b")
    points = seg.select(
        F.col("__b"),
        F.greatest("__s", F.col("__b").cast("timestamp")).alias("__ts"),
        F.lit(1).alias("__delta"),
        F.lit(0).alias("__ord"),
        F.col("__id"),
    ).unionByName(
        seg.select(
            F.col("__b"),
            F.when(ends_here, F.col("__e"))
            .otherwise(F.date_add("__b", 1).cast("timestamp"))
            .alias("__ts"),
            F.lit(-1).alias("__delta"),
            F.when(ends_here, F.lit(1)).otherwise(F.lit(2)).alias("__ord"),
            F.col("__id"),
        )
    )
    cum = prefix_sum(
        points,
        [F.col("__b"), F.col("__ts"), F.col("__ord"), F.col("__id")],
        "__delta",
        "__running",
    ).select(
        F.col("__b").alias("bucket_start"),
        F.col("__ts"),
        F.col("__running"),
    )
    # rename the peak table's key: `daily` shares lineage with `cum`
    # (self-join), so qualified refs to the same column name are
    # ambiguous to the analyzer
    daily = cum.groupBy(F.col("bucket_start").alias("__b")).agg(
        F.max("__running").cast("bigint").alias("peak")
    )
    return (
        cum.join(
            daily,
            (F.col("bucket_start") == F.col("__b"))
            & (F.col("__running") == F.col("peak")),
        )
        .groupBy("__b", "peak")
        .agg(F.min("__ts").alias("peak_ts"))
        .select(F.col("__b").alias("bucket_start"), "peak", "peak_ts")
    )


def kaplan_meier(
    df: DataFrame,
    group_cols: Sequence[str],
    duration_col: str,
    event_col: str,
) -> DataFrame:
    """Kaplan-Meier product-limit survival estimator per group: one row
    per subject carrying its observed duration t and an event flag
    (1 = the event occurred at t, 0 = censored at t — still alive when
    observation stopped). For each distinct EVENT time t_i,

        S(t_i) = prod_{j <= i} (1 - d_j / n_j)

    with d_j = events at t_j and n_j = subjects still at risk
    (duration >= t_j). Censored subjects shrink the risk set without
    contributing an event — the whole point of the estimator (dropping
    them instead biases survival downward; Kaplan & Meier '58). The
    time-to-conversion / retention readout next to cohort_retention's
    fixed calendar buckets. Output per group, one row per event time:
    (group..., t, n_risk, n_event, n_censored, survival) with survival
    rounded to 6 dp, ordered by (group..., t).

    Scale shape: subjects collapse ONCE to the per-(group, t) count
    table (map-side combine) — windows and arithmetic all run on that
    |distinct durations|-row table, which is calendar-bounded (day
    granularity: a decade is ~3.7k rows/group), never subject-sized.
    The product rides exp(sum(ln ...)) over a running window in
    deterministic (unique-t) frame order, with an any-zero-factor flag
    so S(t) = 0 is exact, not exp(-inf); both engines evaluate the
    identical expression tree, so the curve is oracle-checkable.
    """
    t = F.col(duration_col)
    ev = F.col(event_col).cast("int")
    cells = (
        df.where(t.isNotNull() & ev.isNotNull())
        .groupBy(*group_cols, t.alias("t"))
        .agg(
            F.sum(ev).alias("n_event"),
            F.sum(1 - ev).alias("n_censored"),
        )
    )
    w_all = (
        Window.partitionBy(*[F.col(c) for c in group_cols])
        if group_cols
        else Window.partitionBy()
    )
    w_run = w_all.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    w_prev = w_all.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    # risk set: everyone minus those who left strictly before t
    out = (
        cells.withColumn("__total", F.sum(F.col("n_event") + F.col("n_censored")).over(w_all))
        .withColumn(
            "n_risk",
            F.col("__total")
            - F.coalesce(
                F.sum(F.col("n_event") + F.col("n_censored")).over(w_prev),
                F.lit(0),
            ),
        )
        .withColumn(
            "__factor",
            1.0 - F.col("n_event").cast("double") / F.col("n_risk").cast("double"),
        )
        .withColumn("__dead", F.max((F.col("__factor") == 0.0).cast("int")).over(w_run))
        .withColumn(
            "survival",
            F.round(
                F.when(F.col("__dead") == 1, F.lit(0.0)).otherwise(
                    # ln only over positive factors (explicitly, so the
                    # oracle's CASE-guarded ln sums the same terms —
                    # DuckDB errors on ln(0), Spark nulls it); the zero
                    # row itself is already forced to 0 by __dead
                    F.exp(
                        F.sum(
                            F.when(
                                F.col("__factor") > 0, F.log(F.col("__factor"))
                            )
                        ).over(w_run)
                    )
                ),
                6,
            ),
        )
    )
    return (
        out.where(F.col("n_event") > 0)
        .select(*group_cols, "t", "n_risk", "n_event", "n_censored", "survival")
        .orderBy(*group_cols, "t")
    )


def nelson_aalen(
    df: DataFrame,
    group_cols: Sequence[str],
    duration_col: str,
    event_col: str,
) -> DataFrame:
    """Nelson-Aalen cumulative-hazard estimator per group — the
    integral twin of `kaplan_meier` (same subject rows: observed
    duration t + event flag, 0 = censored). For each distinct EVENT
    time t_i,

        H(t_i)   = sum_{j <= i} d_j / n_j
        Var(t_i) = sum_{j <= i} d_j / n_j^2          (Aalen '78)

    with d_j = events at t_j and n_j = subjects still at risk. Where KM
    answers "what fraction survives past t", NA answers "how much
    hazard has accumulated by t" — additive, so it stays finite and
    informative when S(t) hits 0, and its per-interval increments read
    directly as instantaneous event rates. Output per group, one row
    per event time: (group..., t, n_risk, n_event, n_censored,
    cum_hazard, var_hazard), 6 dp, ordered by (group..., t).

    Scale shape: identical to kaplan_meier — subjects collapse ONCE to
    the per-(group, t) count table (map-side combine); the running sums
    ride windows over that calendar-bounded |distinct t|-row table in
    deterministic unique-t frame order. Rational sums of integer
    ratios, so the curve is oracle-exact at 6 dp.
    """
    t = F.col(duration_col)
    ev = F.col(event_col).cast("int")
    cells = (
        df.where(t.isNotNull() & ev.isNotNull())
        .groupBy(*group_cols, t.alias("t"))
        .agg(
            F.sum(ev).alias("n_event"),
            F.sum(1 - ev).alias("n_censored"),
        )
    )
    w_all = (
        Window.partitionBy(*[F.col(c) for c in group_cols])
        if group_cols
        else Window.partitionBy()
    )
    w_run = w_all.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    w_prev = w_all.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    d = F.col("n_event").cast("double")
    n = F.col("n_risk").cast("double")
    out = (
        cells.withColumn(
            "__total", F.sum(F.col("n_event") + F.col("n_censored")).over(w_all)
        )
        .withColumn(
            "n_risk",
            F.col("__total")
            - F.coalesce(
                F.sum(F.col("n_event") + F.col("n_censored")).over(w_prev),
                F.lit(0),
            ),
        )
        .withColumn("cum_hazard", F.round(F.sum(d / n).over(w_run), 6))
        .withColumn("var_hazard", F.round(F.sum(d / (n * n)).over(w_run), 6))
    )
    return (
        out.where(F.col("n_event") > 0)
        .select(
            *group_cols,
            "t",
            "n_risk",
            "n_event",
            "n_censored",
            "cum_hazard",
            "var_hazard",
        )
        .orderBy(*group_cols, "t")
    )


def theil_sen_trend(
    df: DataFrame,
    group_cols: Sequence[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Theil-Sen robust trend per group: the median of all pairwise
    slopes (y_j - y_i) / (x_j - x_i) over the group's series, with the
    matching median-residual intercept (Theil '50, Sen '68). Breakdown
    point ~29% — a handful of wild outlier days bends an OLS fit
    (`grouped_ols`) but leaves the Theil-Sen slope untouched, which is
    why it's the standard robust twin for monitoring-style "is this
    metric drifting" readouts. Output per group: (group..., n_points,
    n_pairs, slope, intercept), 6 dp.

    Scale shape: the raw stream collapses ONCE (map-side combine) to a
    per-(group, x) mean-y cell table — calendar-bounded when x is a day
    or bucket index (a decade of daily points is ~3.7k rows/group), so
    the pairwise self-join is |series|^2 per group over that bounded
    table, NEVER corpus-quadratic, and the join key is the group (plain
    hash equi-join). Medians are Spark's exact percentile over the
    bounded pair set; the |groups|-row slope table broadcasts back for
    the intercept pass. Both medians interpolate even counts the same
    way DuckDB's median() does, so the fit is oracle-checkable.
    """
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    cells = (
        df.where(x.isNotNull() & y.isNotNull())
        .groupBy(*group_cols, x.alias("x"))
        .agg(F.avg(y).alias("y"))
    )
    # cut: both pair-join sides would re-run the cell aggregation (r10)
    cells = truncate_lineage(cells)
    a = cells.alias("a")
    b = cells.alias("b")
    on = [F.col(f"a.{c}") == F.col(f"b.{c}") for c in group_cols]
    pairs = a.join(b, on + [F.col("a.x") < F.col("b.x")]).select(
        *[F.col(f"a.{c}").alias(c) for c in group_cols],
        (
            (F.col("b.y") - F.col("a.y")) / (F.col("b.x") - F.col("a.x"))
        ).alias("pair_slope"),
    )
    slopes = pairs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.percentile(F.col("pair_slope"), F.lit(0.5)).alias("__slope"),
    )
    with_slope = cells.join(F.broadcast(slopes), list(group_cols))
    fit = with_slope.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.any_value(F.col("n_pairs")).alias("n_pairs"),
        F.any_value(F.col("__slope")).alias("__slope"),
        F.percentile(
            F.col("y") - F.col("__slope") * F.col("x"), F.lit(0.5)
        ).alias("__intercept"),
    )
    return fit.select(
        *group_cols,
        "n_points",
        "n_pairs",
        F.round(F.col("__slope"), 6).alias("slope"),
        F.round(F.col("__intercept"), 6).alias("intercept"),
    ).orderBy(*group_cols)


def best_split(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col: str,
    value_col: str,
) -> DataFrame:
    """Single change-point localization by binary segmentation (one
    level): per group, the split position that maximizes the
    standardized mean-shift statistic

        score(i) = sqrt(i·(n−i)/n) · |mean(y_1..i) − mean(y_i+1..n)|

    over the group's series in `order_col` order — the CUSUM-equivalent
    scan statistic (Scott & Knott '74 / standard binary segmentation),
    answering WHERE the level shifted, where `cusum_shift` answers
    WHETHER a shift crossed a threshold. Duplicate order keys collapse
    to their mean first (same contract as theil_sen_trend). Output per
    group: (group..., split_after, n_left, n_right, mean_left,
    mean_right, score) — the split is AFTER the reported order value —
    rounded to 6 dp, ties broken toward the earliest split; groups
    with fewer than 2 distinct order values emit nothing.

    Scale shape: the raw stream collapses ONCE (map-side combine) to
    the per-(group, order) cell table — calendar-bounded for time
    series; every candidate split is one row of a single keyed window
    sort over that bounded table (running sum/count + group totals on
    the SAME sort), and the argmax is a row_number over the same
    partitioning. Nothing is quadratic, nothing global-sorts.
    """
    o = F.col(order_col)
    y = F.col(value_col).cast("double")
    cells = (
        df.where(o.isNotNull() & y.isNotNull())
        .groupBy(*group_cols, o.alias("__t"))
        .agg(F.avg(y).alias("__y"))
    )
    w_all = (
        Window.partitionBy(*[F.col(c) for c in group_cols])
        if group_cols
        else Window.partitionBy()
    )
    w_run = w_all.orderBy("__t").rowsBetween(Window.unboundedPreceding, 0)
    scored = (
        cells.withColumn("__i", F.row_number().over(w_all.orderBy("__t")))
        .withColumn("__cum", F.sum("__y").over(w_run))
        .withColumn("__n", F.count(F.lit(1)).over(w_all))
        .withColumn("__tot", F.sum("__y").over(w_all))
        .where(F.col("__i") < F.col("__n"))  # split strictly inside
        .withColumn("__ml", F.col("__cum") / F.col("__i"))
        .withColumn(
            "__mr",
            (F.col("__tot") - F.col("__cum")) / (F.col("__n") - F.col("__i")),
        )
        .withColumn(
            "__score",
            F.sqrt(
                F.col("__i").cast("double")
                * (F.col("__n") - F.col("__i"))
                / F.col("__n")
            )
            * F.abs(F.col("__ml") - F.col("__mr")),
        )
    )
    pick = F.row_number().over(
        w_all.orderBy(F.col("__score").desc(), F.col("__t").asc())
    )
    return (
        scored.withColumn("__rn", pick)
        .where(F.col("__rn") == 1)
        .select(
            *group_cols,
            F.col("__t").alias("split_after"),
            F.col("__i").alias("n_left"),
            (F.col("__n") - F.col("__i")).alias("n_right"),
            F.round("__ml", 6).alias("mean_left"),
            F.round("__mr", 6).alias("mean_right"),
            F.round("__score", 6).alias("score"),
        )
        .orderBy(*group_cols)
    )


def rolling_corr(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col: str,
    x_col: str,
    y_col: str,
    window: int = 7,
) -> DataFrame:
    """Trailing-k rolling Pearson correlation between two metrics per
    key — the co-movement monitor next to rolling_zscore's level
    monitor (a metric pair that historically moves together and
    suddenly decouples is the classic silent-breakage signal). For
    each row, corr over the trailing `window` rows (current included):

        r = (n·Σxy − Σx·Σy) / sqrt((n·Σxx − Σx²)·(n·Σyy − Σy²))

    emitted only when the frame is FULL (n = window, counting only
    rows where BOTH x and y are non-NULL — n = count(x*y) so n and
    the six sums always describe the same row set; a frame containing
    a NULL x or y is not full and reports NULL) and both variance
    terms are positive — partial frames and constant series report
    NULL rather than a noisy or undefined coefficient. Output: (group
    ..., order, r_xy) rounded to 6 dp, ordered by (group..., order).

    Scale shape: ONE keyed window sort drives all six frame sums (the
    closed form avoids two passes or a self-join); fixed-size JVM
    expressions, no Python, no shuffle beyond the single keyed sort.
    The six-sum expansion is evaluated identically in the oracle, so
    the coefficient is cross-engine stable at 6 dp.
    """
    if window < 2:
        raise ValueError("window must be >= 2")
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    w = (
        (
            Window.partitionBy(*[F.col(c) for c in group_cols])
            if group_cols
            else Window.partitionBy()
        )
        .orderBy(order_col)
        .rowsBetween(-(window - 1), 0)
    )
    # count(x*y) skips any row where EITHER side is NULL, so n, the
    # sums, and the full-frame check all use the same row set — a
    # count(*) here would silently emit a wrong coefficient whenever
    # a full frame contains a NULL x or y.
    n = F.count(x * y).over(w).cast("double")
    sx = F.sum(x).over(w)
    sy = F.sum(y).over(w)
    sxx = F.sum(x * x).over(w)
    syy = F.sum(y * y).over(w)
    sxy = F.sum(x * y).over(w)
    varx = n * sxx - sx * sx
    vary = n * syy - sy * sy
    r = F.when(
        (n == window) & (varx > 0) & (vary > 0),
        (n * sxy - sx * sy) / F.sqrt(varx * vary),
    )
    return df.select(
        *group_cols, F.col(order_col), F.round(r, 6).alias("r_xy")
    ).orderBy(*group_cols, order_col)


def weighted_quantiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    weight_col: str,
    qs: Sequence[float] = (0.25, 0.5, 0.75),
) -> DataFrame:
    """Exact weighted quantiles per group — the weighted generalization
    of `exact_quantiles` for frequency/importance-weighted data (count
    tables, importance-sampled corpora, survey weights): for each q,
    the SMALLEST value v whose cumulative weight reaches q·W (the
    lower weighted quantile / weighted type-1 definition — a value
    actually present in the data, no interpolation, so the answer is
    exact under any arithmetic). Zero/negative weights are rejected
    rows. Output: (group..., q, value) ordered by (group..., q).

    Scale shape: raw rows collapse ONCE (map-side combine) to the
    per-(group, value) weight-cell table; the cumulative weight rides
    one keyed window sort over that |distinct values|-row table; the
    |qs|-entry quantile spine joins in as an exploded literal array
    (broadcast-sized), and exactly one cell row survives per (group,
    q) via the prev < q·W <= cum band — shuffle is O(distinct values),
    NEVER a global sort of the raw data. With integer weights every
    threshold compare is exact in IEEE double below 2^52, so the
    result is bit-identical across engines.
    """
    for q in qs:
        if not (0.0 < q <= 1.0):
            raise ValueError("each q must be in (0, 1]")
    v = F.col(value_col)
    wt = F.col(weight_col).cast("double")
    cells = (
        df.where(v.isNotNull() & wt.isNotNull() & (wt > 0))
        .groupBy(*group_cols, v.alias("__v"))
        .agg(F.sum(wt).alias("__w"))
    )
    w_all = (
        Window.partitionBy(*[F.col(c) for c in group_cols])
        if group_cols
        else Window.partitionBy()
    )
    w_run = w_all.orderBy("__v").rowsBetween(Window.unboundedPreceding, 0)
    cum = (
        cells.withColumn("__cum", F.sum("__w").over(w_run))
        .withColumn("__tot", F.sum("__w").over(w_all))
        .withColumn("__prev", F.col("__cum") - F.col("__w"))
    )
    spine = F.explode(
        F.array(*[F.lit(float(q)) for q in qs])
    ).alias("q")
    return (
        cum.select(*group_cols, "__v", "__cum", "__prev", "__tot", spine)
        .where(
            (F.col("__prev") < F.col("q") * F.col("__tot"))
            & (F.col("q") * F.col("__tot") <= F.col("__cum"))
        )
        .select(*group_cols, "q", F.col("__v").alias("value"))
        .orderBy(*group_cols, "q")
    )


def quantile_normalize(
    df: DataFrame,
    group_cols: Sequence[str],
    id_col: str,
    value_col: str,
) -> DataFrame:
    """Cross-sample quantile normalization (Bolstad et al. '03): force
    every group's value distribution onto the shared reference
    distribution "mean of the groups' order statistics" — rank each
    value within its group, average the values holding the same rank
    ACROSS groups, and hand every row the average at its rank. The
    batch-effect corrector for comparing metric distributions across
    shards/sources whose scales drifted; ranks (not values) survive,
    so the transform is monotone within each group. Groups of unequal
    size average over the groups PRESENT at that rank (the standard
    ragged-panel convention). Ties order by (value, id) so ranks are
    total and the map is deterministic. Output: (group..., id, value,
    qnorm) with qnorm rounded to 6 dp, ordered by (group..., id).

    Scale shape: one keyed window sort per group for ranks, one
    |ranks|-row partial-agg reference table (rank-keyed, bounded by
    max group size), one equi-join back on the rank. Never quadratic,
    never a global sort.
    """
    v = F.col(value_col).cast("double")
    w = (
        Window.partitionBy(*[F.col(c) for c in group_cols])
        if group_cols
        else Window.partitionBy()
    ).orderBy(v.asc(), F.col(id_col).asc())
    ranked = df.where(v.isNotNull()).select(
        *group_cols,
        F.col(id_col),
        v.alias("__v"),
        F.row_number().over(w).alias("__rk"),
    )
    ref = ranked.groupBy("__rk").agg(F.avg("__v").alias("__ref"))
    return (
        ranked.join(ref, "__rk")
        .select(
            *group_cols,
            id_col,
            # the echo column is rounded like every float output here:
            # an unrounded SUM passthrough leaks summation-order noise
            # (found by the sf1.0 exact sweep — '332997.8' vs
            # '...79999999993'); ranks use the UNROUNDED value, so a
            # boundary tie at the 6th dp cannot reorder the map
            F.round(F.col("__v"), 6).alias("value"),
            F.round(F.col("__ref"), 6).alias("qnorm"),
        )
        .orderBy(*group_cols, id_col)
    )


def trimmed_mean(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    trim: float = 0.1,
) -> DataFrame:
    """Exact per-group trimmed mean: drop the floor(n·trim) smallest and
    largest values, average the rest — the robust center that tolerates
    a bounded fraction of wild rows where a plain mean follows them and
    a median throws all magnitude information away (the standard
    aggregate for latency / spend metrics with fat tails). trim is per
    side, 0 <= trim < 0.5. Duplicates at the cut boundary are
    interchangeable (equal values), so the trimmed multiset — and the
    mean — is deterministic even though their rank order is not.
    Output per group: (group..., n, n_trimmed_each_side, trimmed_mean)
    rounded to 6 dp, ordered by group; 2·floor(n·trim) < n for every
    trim < 0.5, so at least one row always survives the trim.

    Scale shape: one keyed window sort gives rank and count together;
    the kept band is a row filter and the mean a partial agg on the
    same partitioning — one shuffle total.
    """
    if not (0.0 <= trim < 0.5):
        raise ValueError("need 0 <= trim < 0.5")
    v = F.col(value_col).cast("double")
    wp = (
        Window.partitionBy(*[F.col(c) for c in group_cols])
        if group_cols
        else Window.partitionBy()
    )
    ranked = df.where(v.isNotNull()).select(
        *group_cols,
        v.alias("__v"),
        F.row_number().over(wp.orderBy(v.asc())).alias("__rk"),
        F.count(F.lit(1)).over(wp).alias("__n"),
    )
    cut = F.floor(F.col("__n") * F.lit(trim)).cast("long")
    kept = ranked.withColumn("__cut", cut).where(
        (F.col("__rk") > F.col("__cut"))
        & (F.col("__rk") <= F.col("__n") - F.col("__cut"))
    )
    return (
        kept.groupBy(*group_cols)
        .agg(
            F.any_value("__n").alias("n"),
            F.any_value("__cut").alias("n_trimmed_each_side"),
            F.round(F.avg("__v"), 6).alias("trimmed_mean"),
        )
        .orderBy(*group_cols)
    )


def lift_curve(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_buckets: int = 10,
) -> DataFrame:
    """Cumulative gains / lift table — the targeting-eval readout next
    to binary_auc (rank quality as one number) and calibration_bins
    (probability honesty): sort by score descending, split into
    n_buckets equal-count bands, and report per band how many
    positives the top-k bands capture versus random targeting:

        lift@b = (cum positives through b / cum rows through b)
                 / overall positive rate

    Bucketing assigns rank r (1-based, ties broken by score DESC —
    band membership for tied scores is value-deterministic at the 6-dp
    rounded score) to bucket floor((r−1)·B/n)+1 — equal-width quantile
    boundaries at ceil(b·n/B), which spreads remainder rows EVENLY
    across bands (n=10, B=4 → sizes 3,2,3,2). This is deliberately NOT
    SQL NTILE, which front-loads the remainder (3,3,2,2): even-spread
    bands keep every band within one row of n/B of each other, so
    per-band rates stay comparable; validate against this formula, not
    ntile(), whenever n % B != 0. Output per bucket:
    (bucket, n, n_pos, cum_n, cum_pos, capture_rate, lift) rounded to
    6 dp, ordered by bucket.

    Scale shape: scores collapse ONCE (map-side combine) to the
    per-(rounded score) count/positive cell table — the ONLY window
    sorts run over that cell table, whose size is |distinct 6-dp
    scores| (<= ~2M for probability-range scores), never the row
    count; the straddle explode emits at most |cells| + |buckets|
    rows, and the bucket rollup is a |buckets|-row partial agg. The
    global window is cell-table-bounded by construction (allowlisted
    in tools/plan_lint.py with this reason).
    """
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    s = F.round(F.col(score_col).cast("double"), 6)
    y = F.col(label_col).cast("int")
    cells = (
        df.where(s.isNotNull() & y.isNotNull())
        .groupBy(s.alias("__s"))
        .agg(F.count(F.lit(1)).alias("__c"), F.sum(y).alias("__p"))
    )
    w_run = Window.orderBy(F.col("__s").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.partitionBy()
    # cumulative row index of the cell's LAST row in score-desc order;
    # the |distinct scores| cell table keeps this window bounded
    pos = (
        cells.withColumn("__hi", F.sum("__c").over(w_run))
        .withColumn("__n", F.sum("__c").over(w_all))
        .withColumn("__pos_tot", F.sum("__p").over(w_all))
    )
    # exact NTILE band of each row inside the cell: rows (lo, hi] span
    # buckets; explode cells across the buckets they straddle
    lo = F.col("__hi") - F.col("__c")
    b_first = F.floor(lo * n_buckets / F.col("__n")).cast("long") + 1
    # a row index r (1-based) lands in bucket floor((r-1)*B/n)+1
    b_last = (
        F.floor((F.col("__hi") - 1) * n_buckets / F.col("__n")).cast("long")
        + 1
    )
    exploded = pos.withColumn(
        "bucket", F.explode(F.sequence(b_first, b_last))
    )
    # rows of this cell inside this bucket: overlap of (lo, hi] with the
    # bucket's (start, end] row range — integer arithmetic throughout
    bstart = F.ceil((F.col("bucket") - 1) * F.col("__n") / n_buckets).cast(
        "long"
    )
    bend = F.ceil(F.col("bucket") * F.col("__n") / n_buckets).cast("long")
    take_lo = F.greatest(lo, bstart)
    take_hi = F.least(F.col("__hi"), bend)
    rows_in = (take_hi - take_lo).cast("double")
    # positives spread uniformly across a tied cell's rows would be
    # fractional; instead attribute positives by the SAME integer
    # split: positives are indistinguishable within a tied score, so
    # attribute proportionally with exact rational arithmetic and
    # round once at the end
    frac = rows_in / F.col("__c").cast("double")
    per_bucket = (
        exploded.where(rows_in > 0)
        .groupBy("bucket")
        .agg(
            F.sum(rows_in).cast("long").alias("n"),
            F.sum(F.col("__p") * frac).alias("__pos_f"),
            F.any_value("__n").alias("__tot"),
            F.any_value("__pos_tot").alias("__ptot"),
        )
    )
    w_cum = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    out = (
        per_bucket.withColumn("cum_n", F.sum("n").over(w_cum))
        .withColumn("__cum_pos", F.sum("__pos_f").over(w_cum))
        .select(
            "bucket",
            "n",
            F.round("__pos_f", 6).alias("n_pos"),
            "cum_n",
            F.round("__cum_pos", 6).alias("cum_pos"),
            F.round(F.col("__cum_pos") / F.col("__ptot"), 6).alias(
                "capture_rate"
            ),
            F.round(
                (F.col("__cum_pos") / F.col("cum_n"))
                / (F.col("__ptot") / F.col("__tot")),
                6,
            ).alias("lift"),
        )
        .orderBy("bucket")
    )
    return out


def hill_tail_index(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k: int = 100,
) -> DataFrame:
    """Hill estimator of the power-law tail index per group (Hill '75)
    — the heavy-tail diagnostic next to zipf_fit's rank-frequency
    slope: over the k largest positive values x_(1) >= ... >= x_(k)
    with threshold x_(k+1),

        alpha = k / Σ_{i=1..k} ln( x_(i) / x_(k+1) )

    Low alpha (< 2) means infinite-variance tails — the regime where
    mean-based monitors (rolling_zscore, ab_ttest) silently stop
    working, which is exactly when a pipeline needs to know. Groups
    with fewer than k+1 positive values report NULL alpha (not a
    noisy small-k estimate) alongside their n so the caller sees WHY.
    Ties at the threshold follow the strict top-k order statistics
    (rank by value desc). Output: (group..., n_pos, k_used, x_k1,
    alpha) with x_k1/alpha rounded to 6 dp, ordered by group.

    Scale shape: per-group top-(k+1) rides ONE keyed window rank
    (row_number over value desc, id-free — duplicates are genuine
    order statistics), rows beyond k+1 are dropped BEFORE any math,
    so the log-sum runs over <= k+1 rows per group; the n_pos count
    is a partial-aggregated cell join. The k-term float sum is
    bounded (k ~ 100) so summation-order noise cannot reach the 6th
    decimal; ln is IEEE-identical across engines.
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    if not group_cols:
        raise ValueError(
            "hill_tail_index needs group_cols: the top-k rank is a keyed "
            "window; a global variant would funnel all rows to one task"
        )
    v = F.col(value_col).cast("double")
    pos = df.where(v.isNotNull() & (v > 0)).select(
        *group_cols, v.alias("__v")
    )
    counts = pos.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_pos")
    )
    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy(
        F.col("__v").desc()
    )
    top = pos.withColumn("__rk", F.row_number().over(w)).where(
        F.col("__rk") <= k + 1
    )
    stats = top.groupBy(*group_cols).agg(
        F.max(F.when(F.col("__rk") == k + 1, F.col("__v"))).alias("__xk1"),
        F.sum(
            F.when(F.col("__rk") <= k, F.log(F.col("__v")))
        ).alias("__logsum"),
    )
    # degenerate guard (found by the hypothesis layer, r10): when every
    # top-k value equals x_{k+1} (a constant tail) the denominator is
    # exactly 0 — the estimator is undefined there, and ANSI mode would
    # raise DIVIDE_BY_ZERO instead of returning a row. Emit NULL alpha.
    denom = F.col("__logsum") - F.lit(float(k)) * F.log(F.col("__xk1"))
    alpha = F.when(F.col("__xk1").isNotNull() & (denom != 0), F.lit(float(k)) / denom)
    out = counts.join(stats, list(group_cols))
    return out.select(
        *group_cols,
        "n_pos",
        F.least(F.lit(k), F.col("n_pos")).cast("int").alias("k_used"),
        F.round(F.col("__xk1"), 6).alias("x_k1"),
        F.round(alpha, 6).alias("alpha"),
    ).orderBy(*group_cols)


def interarrival_stats(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    min_events: int = 3,
) -> DataFrame:
    """Inter-arrival-time profile per key: mean gap, gap standard
    deviation, coefficient of variation, and the Goh-Barabasi
    burstiness B = (sigma - mu) / (sigma + mu) in [-1, 1] — the
    behavioral fingerprint that separates periodic/bot traffic
    (B -> -1, CV -> 0) from human bursty activity (B > 0); the
    per-entity twin of `acf`'s corpus-level readout. Gaps are measured
    in whole seconds between consecutive events per key; keys with
    fewer than `min_events` events (i.e. < min_events-1 gaps) are
    dropped — a one-gap entity has an undefined sigma. Population
    (not sample) sigma: sqrt(E[g^2] - E[g]^2). Output: (key...,
    n_events, n_gaps, mean_gap_s, sd_gap_s, cv, burstiness) rounded
    to 6 dp, ordered by key.

    Scale shape: ONE keyed window sort (lag per key) produces gaps
    map-side relative to the shuffle; the moments collapse through a
    partial-aggregated (sum, sum-of-squares, count) cell per key —
    gaps are INTEGER seconds, so both sums are exact in IEEE double
    below 2^52 and every derived float is division-of-exact-integers,
    cross-engine stable at 6 dp. Nothing row-proportional survives
    the per-key collapse.
    """
    if min_events < 2:
        raise ValueError("min_events must be >= 2")
    if not key_cols:
        raise ValueError("interarrival_stats needs key_cols (keyed window)")
    ts = F.col(ts_col).cast("timestamp")
    # unix_timestamp is integer seconds; the lag-self difference is an
    # exact long. Equal-timestamp events produce 0-second gaps (kept:
    # a burst IS zero gaps). The lag order among ties is arbitrary but
    # the gap MULTISET is tie-order-invariant: any ordering of equal
    # timestamps yields the same sorted value sequence, hence the same
    # consecutive differences — so the aggregate moments are exact and
    # deterministic without a secondary sort key.
    gaps = (
        df.where(ts.isNotNull())
        .select(*key_cols, F.unix_timestamp(ts).alias("__t"))
        .withColumn("__gap", F.col("__t") - F.lag("__t").over(
            Window.partitionBy(*[F.col(c) for c in key_cols]).orderBy(
                F.col("__t").asc()
            )
        ))
    )
    cells = gaps.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count("__gap").alias("n_gaps"),
        F.sum("__gap").alias("__s"),
        F.sum(F.col("__gap") * F.col("__gap")).alias("__ss"),
    )
    mu = F.col("__s").cast("double") / F.col("n_gaps")
    var = F.col("__ss").cast("double") / F.col("n_gaps") - mu * mu
    # clamp tiny negative float residue before sqrt
    sd = F.sqrt(F.greatest(var, F.lit(0.0)))
    return (
        cells.where(F.col("n_events") >= min_events)
        .select(
            *key_cols,
            "n_events",
            "n_gaps",
            F.round(mu, 6).alias("mean_gap_s"),
            F.round(sd, 6).alias("sd_gap_s"),
            F.round(
                F.when(mu > 0, sd / mu), 6
            ).alias("cv"),
            F.round(
                F.when(sd + mu > 0, (sd - mu) / (sd + mu)), 6
            ).alias("burstiness"),
        )
        .orderBy(*key_cols)
    )


def rfm_scores(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    amount_col: str,
    buckets: int = 5,
) -> DataFrame:
    """RFM (recency / frequency / monetary) scoring per entity — the
    classic customer-value segmentation, and more generally the
    activity-value fingerprint for any keyed event stream (data
    sources, crawl domains, annotators). Each dimension is bucketed
    1..B by equal-count bands over the per-key aggregate, higher =
    better (more recent / more frequent / higher spend); the composite
    is rfm = 100*r + 10*f + m (for B <= 9). Band assignment is rank
    r -> floor((r-1)*B/n)+1 over a DETERMINISTIC order: monetary is
    rounded to 2 dp BEFORE ranking (sums of 2-dp amounts are exact
    multiples of 0.01 obscured by ~1e-10 float noise; ranking the raw
    sum would let summation order flip equal-value ranks across
    engines), and every rank ties on the key id. Output: (key,
    last_ts, frequency, monetary, r_score, f_score, m_score, rfm)
    ordered by key.

    Scale shape: raw events collapse ONCE (map-side combine) to the
    |keys|-row (last_ts, count, sum) cell table; each of the three
    ranks is a range-partition + broadcast-offset global rank
    (operators/sort.global_sort_ranked — never a single-task window)
    over that cell table; n arrives as a broadcast 1-row count. Three
    skinny |keys|-row range shuffles, nothing event-sized after the
    first collapse.
    """
    if not (2 <= buckets <= 9):
        raise ValueError("buckets must be in 2..9 (rfm digit composite)")
    from hdp_tez_spark.operators.sort import global_sort_ranked

    cells = (
        df.where(F.col(ts_col).isNotNull())
        .groupBy(F.col(key_col).alias("key"))
        .agg(
            F.max(F.col(ts_col)).alias("last_ts"),
            F.count(F.lit(1)).alias("frequency"),
            F.round(F.sum(F.col(amount_col).cast("double")), 2).alias(
                "monetary"
            ),
        )
    )
    n_tab = cells.groupBy().agg(F.count(F.lit(1)).alias("__n"))

    def band(ranked: DataFrame, rank_col: str, out: str) -> DataFrame:
        return ranked.crossJoin(F.broadcast(n_tab)).withColumn(
            out,
            (
                F.floor(
                    (F.col(rank_col) - 1) * buckets / F.col("__n")
                ) + 1
            ).cast("int"),
        ).drop(rank_col, "__n")

    r = band(
        global_sort_ranked(
            cells, [F.col("last_ts").asc(), F.col("key").asc()], "__rr"
        ),
        "__rr",
        "r_score",
    )
    f = band(
        global_sort_ranked(
            r, [F.col("frequency").asc(), F.col("key").asc()], "__rf"
        ),
        "__rf",
        "f_score",
    )
    m = band(
        global_sort_ranked(
            f, [F.col("monetary").asc(), F.col("key").asc()], "__rm"
        ),
        "__rm",
        "m_score",
    )
    return m.select(
        "key",
        "last_ts",
        "frequency",
        "monetary",
        "r_score",
        "f_score",
        "m_score",
        (
            F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score")
        ).cast("int").alias("rfm"),
    ).orderBy("key")


def behavior_entropy(
    df: DataFrame,
    key_cols: Sequence[str],
    type_col: str,
    ts_col: str,
    tiebreak_col: str,
    min_events: int = 2,
) -> DataFrame:
    """Per-entity behavioral predictability: Shannon entropy of the
    event-type distribution (H_marginal) and conditional next-event
    entropy H(next | current) over the time-ordered stream — the
    bot-vs-human fingerprint next to interarrival_stats (bots replay a
    script: both entropies collapse toward 0; engaged humans mix). The
    conditional entropy is sum_a p(a) * H(next | cur=a), computed from
    the lag-pair cell table; the order is (ts, tiebreak) so ties can't
    reshuffle transitions across engines. Entities with fewer than
    `min_events` events are dropped (no transitions to measure).
    Output: (key..., n_events, n_types, h_marginal, h_conditional)
    rounded to 6 dp, ordered by key.

    Scale shape: ONE keyed window (the lag) over the raw stream; both
    entropies then live on cell tables bounded by |types| and |types|^2
    per entity — the sums are over cells, never rows.
    """
    keys = [F.col(c) for c in key_cols]
    w = Window.partitionBy(*keys).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    base = df.where(F.col(ts_col).isNotNull()).select(
        *key_cols,
        F.col(type_col).alias("__t"),
        F.lag(F.col(type_col)).over(w).alias("__prev"),
    )
    # marginal cells: (key, type) counts
    marg = base.groupBy(*key_cols, "__t").agg(F.count(F.lit(1)).alias("__c"))
    totals = marg.groupBy(*key_cols).agg(
        F.sum("__c").alias("n_events"),
        F.count(F.lit(1)).alias("n_types"),
    )
    p = F.col("__c").cast("double") / F.col("n_events")
    h_marg = (
        marg.join(totals, list(key_cols))
        .groupBy(*key_cols)
        .agg((-F.sum(p * F.log2(p))).alias("__hm"))
    )
    # transition cells: (key, prev, next) counts over rows with a prev
    trans = (
        base.where(F.col("__prev").isNotNull())
        .groupBy(*key_cols, "__prev", "__t")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    prev_tot = trans.groupBy(*key_cols, "__prev").agg(
        F.sum("__c").alias("__ca")
    )
    all_tot = trans.groupBy(*key_cols).agg(F.sum("__c").alias("__n"))
    cond = F.col("__c").cast("double") / F.col("__ca")
    h_cond = (
        trans.join(prev_tot, list(key_cols) + ["__prev"])
        .join(all_tot, list(key_cols))
        .groupBy(*key_cols)
        .agg(
            (
                -F.sum(
                    (F.col("__c").cast("double") / F.col("__n"))
                    * F.log2(cond)
                )
            ).alias("__hc")
        )
    )
    return (
        totals.where(F.col("n_events") >= min_events)
        .join(h_marg, list(key_cols))
        .join(h_cond, list(key_cols), "left")
        .select(
            *key_cols,
            "n_events",
            "n_types",
            # + 0.0 normalizes IEEE -0.0 (single-type entities) for the
            # driver's string hash
            F.round(F.col("__hm") + F.lit(0.0), 6).alias("h_marginal"),
            F.round(
                F.coalesce(F.col("__hc"), F.lit(0.0)) + F.lit(0.0), 6
            ).alias("h_conditional"),
        )
        .orderBy(*key_cols)
    )


def event_affinity(
    df: DataFrame,
    key_cols: Sequence[str],
    type_col: str,
) -> DataFrame:
    """Pairwise event-type affinity across entities: for every
    unordered type pair (a < b), the lift and PMI of co-occurring
    within the same entity — the cross-sell / co-engagement readout
    (which behaviors travel together), and for a corpus the
    topic-co-occurrence map. With N entities, n_a entities exhibiting
    a, and n_ab exhibiting both: lift = n_ab * N / (n_a * n_b),
    pmi = log2(lift); pairs never co-occurring are absent (their PMI is
    -inf by definition — consumers treat absence as "no signal").
    Output: (type_a, type_b, n_both, n_a, n_b, lift, pmi) rounded to
    6 dp, ordered by (type_a, type_b).

    Scale shape: raw events collapse ONCE to the distinct
    (entity, type) presence table; the pair table is a self equi-join
    on the entity key (per-entity fan-out bounded by |types|^2, and
    |types| is small by the nature of a type column); marginals come
    from the presence table, N from a 1-row count broadcast onto the
    |type-pair| cell table. Nothing event-sized past the first
    collapse.
    """
    keys = [F.col(c) for c in key_cols]
    pres = df.where(F.col(type_col).isNotNull()).select(
        *key_cols, F.col(type_col).alias("__t")
    ).distinct()
    n_tab = pres.select(*key_cols).distinct().agg(
        F.count(F.lit(1)).alias("__N")
    )
    marg = pres.groupBy("__t").agg(F.count(F.lit(1)).alias("__n"))
    a = pres.select(*key_cols, F.col("__t").alias("type_a"))
    b = pres.select(*key_cols, F.col("__t").alias("type_b"))
    pairs = (
        a.join(b, list(key_cols))
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    lift = (
        F.col("n_both").cast("double")
        * F.col("__N")
        / (F.col("__na") * F.col("__nb"))
    )
    return (
        pairs.join(
            F.broadcast(marg.select(F.col("__t").alias("type_a"), F.col("__n").alias("__na"))),
            "type_a",
        )
        .join(
            F.broadcast(marg.select(F.col("__t").alias("type_b"), F.col("__n").alias("__nb"))),
            "type_b",
        )
        .crossJoin(F.broadcast(n_tab))
        .select(
            "type_a",
            "type_b",
            "n_both",
            F.col("__na").alias("n_a"),
            F.col("__nb").alias("n_b"),
            F.round(lift, 6).alias("lift"),
            F.round(F.log2(lift), 6).alias("pmi"),
        )
        .orderBy("type_a", "type_b")
    )


def runs_test(
    df: DataFrame,
    group_col: str,
    order_cols: Sequence[str],
    value_col: str,
) -> DataFrame:
    """Wald-Wolfowitz runs test for serial randomness, per group: is
    the sequence of above/below-median values random in time, or does
    it cluster (trends, regime stickiness, feedback loops) /
    oscillate (over-correction)? The structural complement to `acf`
    (which measures LINEAR lag correlation; runs detects any
    sign-pattern dependence) and the pre-flight check before treating
    per-entity series as i.i.d. for bootstrap/CUPED. Values exactly
    equal to the group median are dropped (the classical convention);
    the remaining signs above (n1) / below (n2) yield runs count R and

        mu = 2 n1 n2 / (n1 + n2) + 1
        sigma^2 = 2 n1 n2 (2 n1 n2 - n1 - n2)
                  / ((n1+n2)^2 (n1 + n2 - 1))
        z = (R - mu) / sigma

    Output per group: (group, n1, n2, runs, z_stat) rounded to 6 dp,
    ordered by group; z_stat is NULL when either side is empty,
    n1 + n2 < 2, or sigma = 0 (the n1 = n2 = 1 degenerate). `order_cols` must make the
    within-group order TOTAL (pass a tiebreak column), or run counting
    would be nondeterministic across retries.

    Scale shape: one |groups|-row exact-median aggregate broadcast
    back; run boundaries come from a lag window PARTITIONED BY GROUP
    (never a global funnel); the readout is a |groups|-row aggregate.
    The median comparison is the only float op — both engines compare
    the same doubles, so the sign split is bit-stable.
    """
    v = F.col(value_col).cast("double")
    g = F.col(group_col)
    base = df.where(v.isNotNull() & g.isNotNull()).select(
        g.alias("__g"), *[F.col(c) for c in order_cols], v.alias("__v")
    )
    med = base.groupBy("__g").agg(F.median("__v").alias("__m"))
    signed = (
        base.join(F.broadcast(med), "__g")
        .where(F.col("__v") != F.col("__m"))
        .select(
            "__g",
            *[F.col(c) for c in order_cols],
            (F.col("__v") > F.col("__m")).cast("int").alias("__sign"),
        )
    )
    w = Window.partitionBy("__g").orderBy(*[F.col(c) for c in order_cols])
    runs = signed.select(
        "__g",
        "__sign",
        F.when(
            F.lag("__sign").over(w).isNull()
            | (F.lag("__sign").over(w) != F.col("__sign")),
            1,
        )
        .otherwise(0)
        .alias("__new_run"),
    )
    red = runs.groupBy("__g").agg(
        F.sum("__sign").alias("__n1"),
        F.sum(1 - F.col("__sign")).alias("__n2"),
        F.sum("__new_run").alias("__r"),
    )
    n1, n2, r = F.col("__n1"), F.col("__n2"), F.col("__r")
    n = n1 + n2
    mu = 2.0 * n1 * n2 / n + 1
    var = (
        2.0
        * n1
        * n2
        * (2.0 * n1 * n2 - n1 - n2)
        / (n.cast("double") * n * (n - 1))
    )
    return red.select(
        F.col("__g").alias("group"),
        n1.alias("n1"),
        n2.alias("n2"),
        r.alias("runs"),
        F.round(
            F.when(
                (n1 > 0) & (n2 > 0) & (n > 1) & (2.0 * n1 * n2 > n),
                (r - mu) / F.sqrt(var),
            ),
            6,
        ).alias("z_stat"),
    ).orderBy("group")


def capture_recapture(
    sample_a: DataFrame,
    sample_b: DataFrame,
    id_col: str,
) -> DataFrame:
    """Chapman capture-recapture population estimate from two sighting
    samples — the "how many entities exist that we have NOT seen"
    readout: estimate total population (users, distinct entities,
    undetected duplicate pairs) from two independent samples and their
    overlap. With n_a, n_b the per-sample distinct counts and m the
    overlap:

        N_hat = (n_a + 1)(n_b + 1) / (m + 1) - 1        (Chapman 1951)
        var_hat = (n_a + 1)(n_b + 1)(n_a - m)(n_b - m)
                  / ((m + 1)^2 (m + 2))

    Output: ONE row (n_a, n_b, overlap, est_total, se) rounded to 6 dp
    (est_total too: Chapman is not integer-valued). The estimate
    assumes independent samples with homogeneous capture probability —
    both violated in the direction of UNDER-estimating the population
    when captures are positively correlated; treat it as a lower-bound
    sanity check, not a census. NULL ids are excluded; duplicate ids
    within a sample count once.

    Scale shape: two distinct-collapses (|sample| rows, map-side
    combined) + one id equi-join for the overlap + a 1-row readout.
    Integer counts until the final ratios.
    """
    ai = (
        sample_a.where(F.col(id_col).isNotNull())
        .select(F.col(id_col).alias("__id"))
        .distinct()
    )
    bi = (
        sample_b.where(F.col(id_col).isNotNull())
        .select(F.col(id_col).alias("__id"))
        .distinct()
    )
    ai = truncate_lineage(ai)
    bi = truncate_lineage(bi)
    na = ai.agg(F.count(F.lit(1)).alias("__na"))
    nb = bi.agg(F.count(F.lit(1)).alias("__nb"))
    m = ai.join(bi, "__id").agg(F.count(F.lit(1)).alias("__m"))
    red = na.crossJoin(F.broadcast(nb)).crossJoin(F.broadcast(m))
    a, b, mm = F.col("__na"), F.col("__nb"), F.col("__m")
    est = (a + 1).cast("double") * (b + 1) / (mm + 1) - 1
    var = (
        (a + 1).cast("double")
        * (b + 1)
        * (a - mm)
        * (b - mm)
        / ((mm + 1).cast("double") * (mm + 1) * (mm + 2))
    )
    return red.select(
        a.alias("n_a"),
        b.alias("n_b"),
        mm.alias("overlap"),
        F.round(est, 6).alias("est_total"),
        F.round(F.sqrt(var), 6).alias("se"),
    )
