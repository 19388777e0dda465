"""Window / analytic functions.

Absent from the reference (Tez has no expression layer — SURVEY §2.9), but
Tez's core sorted-shuffle primitive `OrderedPartitionedKVOutput`
(`runtime/library/output/OrderedPartitionedKVOutput.java:63`) is literally
"partition by key, order by comparator" — the physical layout every window
function consumes. This module exposes the idiomatic surface over it.

Scale note: a window spec with no partitionBy funnels the whole dataset
through one task; every helper here requires partition keys. Frames are
evaluated streaming over the sorted run (no whole-partition
materialization) for the running/rank cases.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def spec(partition_by: Sequence[str], order_by: Sequence[Column]) -> WindowSpec:
    return Window.partitionBy(*partition_by).orderBy(*order_by)


def with_rank(df: DataFrame, partition_by: Sequence[str], order_by: Sequence[Column], name: str = "rank", dense: bool = False) -> DataFrame:
    fn = F.dense_rank() if dense else F.rank()
    return df.withColumn(name, fn.over(spec(partition_by, order_by)))


def with_row_number(df: DataFrame, partition_by: Sequence[str], order_by: Sequence[Column], name: str = "rn") -> DataFrame:
    return df.withColumn(name, F.row_number().over(spec(partition_by, order_by)))


def with_lag_lead(
    df: DataFrame,
    col: str,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    offset: int = 1,
    lag_name: str | None = None,
    lead_name: str | None = None,
) -> DataFrame:
    w = spec(partition_by, order_by)
    if lag_name:
        df = df.withColumn(lag_name, F.lag(col, offset).over(w))
    if lead_name:
        df = df.withColumn(lead_name, F.lead(col, offset).over(w))
    return df


def with_running(
    df: DataFrame,
    agg: Column,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    name: str,
) -> DataFrame:
    """Running aggregate: unbounded-preceding .. current row."""
    w = spec(partition_by, order_by).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(name, agg.over(w))


def with_moving(
    df: DataFrame,
    agg: Column,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    preceding: int,
    following: int,
    name: str,
) -> DataFrame:
    """Sliding row-frame aggregate (moving average etc.)."""
    w = spec(partition_by, order_by).rowsBetween(-preceding, following)
    return df.withColumn(name, agg.over(w))


def sessionize(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    gap: str,
    session_col: str = "session_idx",
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Assign a per-key session index to every row: a new session starts
    when the gap to the previous event exceeds `gap` (an INTERVAL string,
    e.g. '30 minutes'). The row-level twin of the session *aggregate*
    (streaming/windows.py session_agg): that collapses sessions to one row,
    this labels every event — what a training-data pipeline needs to group
    interaction logs into conversations without losing the events.

    Cost: ONE shuffle on `keys` feeding two streaming window passes over
    the same sorted run (lag + running sum — no frame materialization).
    Timestamps are compared natively (no epoch truncation): a new session
    iff ts > prev_ts + gap, strict, so sub-second data is handled exactly.
    `tiebreak` columns order same-timestamp events deterministically.
    """
    order = [F.col(ts_col), *[F.col(c) for c in tiebreak]]
    w = spec(keys, order)
    prev = F.lag(ts_col).over(w)
    is_new = F.when(
        prev.isNull() | (F.col(ts_col) > prev + F.expr(f"INTERVAL {gap}")), 1
    ).otherwise(0)
    run = spec(keys, order).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("__new", is_new).withColumn(
        session_col, F.sum("__new").over(run)
    ).drop("__new")


def with_distribution(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    pr_name: str = "pct_rank",
    cd_name: str = "cume_dist",
) -> DataFrame:
    """Distribution window functions: percent_rank (relative rank in
    [0, 1], ties share a value) and cume_dist (fraction of partition
    rows at or before this one) over one keyed sort — the percentile
    position readouts that complete the engine's window surface next to
    rank/ntile (reference scope: the Tez ordered-grouped edge feeds
    arbitrary ranking processors; SURVEY §2.9).

    Cost: ONE hash shuffle on the partition keys + one per-key sort;
    both functions ride the same WindowSpec so Catalyst evaluates them
    in a single Window operator (no second exchange, no second sort).
    Values rounded to 6 dp for engine-portable comparison.
    """
    w = spec(partition_by, order_by)
    return df.withColumn(
        pr_name, F.round(F.percent_rank().over(w), 6)
    ).withColumn(cd_name, F.round(F.cume_dist().over(w), 6))
