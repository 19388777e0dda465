"""Change-data-capture operators: latest-wins upsert merge and
slowly-changing-dimension (type 2) history building.

Reference parity: Tez itself ships no merge semantics — Hive-on-Tez
compiles `MERGE INTO` / ACID compaction onto Tez DAGs (the reference is
the execution layer under it, SURVEY §2.7/§4.5). A user of the reference
runs these exact shapes daily from Hive; the engine surface carries them
as first-class operators so the DAG they compile to is the scale-safe
one.

Both operators are pure joins + windows keyed on the business key:

- one shuffle of the change stream for the per-key latest-wins window;
- one key join base-vs-changes, which AQE broadcasts when the change
  batch is small (the common nightly-CDC case) and shuffle-joins
  otherwise — no hints, no driver-side state;
- nothing ever collects, and payload columns ride the shuffle exactly
  once.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    base: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    seq_col: str,
    op_col: str = "op",
) -> DataFrame:
    """Apply a CDC change batch to a base snapshot, latest-wins per key:
    the highest `seq_col` row per key decides — op 'D' deletes the key,
    any other op ('I'/'U') replaces/inserts the payload. Keys absent from
    `changes` pass through untouched.

    `changes` must carry the same payload columns as `base` (plus
    op/seq); output schema == base schema. `seq_col` must totally order
    each key's changes (CDC log offset / commit LSN) — ties would make
    the winner nondeterministic, so `row_number` over (seq desc) with a
    documented total-order contract, exactly the Hive MERGE precondition.

    Scale: window shuffle on the change batch only (never the base);
    the anti-join and the union are the only operations touching base
    rows, and the join side that shuffles is whichever AQE measures as
    larger. At 100 TB base + small nightly batch this is one broadcast
    anti-join — the base never moves.
    """
    keys = list(key_cols)
    w = Window.partitionBy(*keys).orderBy(F.col(seq_col).desc())
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    survivors = base.join(latest.select(*keys), keys, "left_anti")
    upserts = latest.where(F.col(op_col) != "D").select(*base.columns)
    return survivors.unionByName(upserts)


def scd2_build(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    attr_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Collapse an attribute-change event stream into type-2 dimension
    history: one row per (key, consecutive run of equal attr values) with
    validity interval and current flag — the table Hive users build with
    MERGE + window SQL for point-in-time joins.

    Output: (key, attr, valid_from, valid_to, n_events, is_current);
    valid_to is the next run's valid_from (half-open intervals, so an
    as-of probe `valid_from <= t < valid_to` partitions time exactly),
    NULL on the current row.

    Order within a key is (ts, tiebreak) — pass a tiebreak column when
    timestamps can collide or run boundaries are nondeterministic.

    Scale: both windows partition by the key (no global funnel); the
    run-collapse groupBy carries (key, run_id) with map-side partial
    aggregation. One shuffle total — the second window reuses the
    key partitioning.
    """
    order = [F.col(ts_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else []
    )
    w = Window.partitionBy(key_col).orderBy(*order)
    runs = (
        df.withColumn(
            "__chg",
            F.when(
                F.lag(attr_col).over(w).isNull()
                | (F.col(attr_col) != F.lag(attr_col).over(w)),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "__run",
            F.sum("__chg").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy(key_col, "__run")
        .agg(
            F.min(attr_col).alias(attr_col),  # constant within a run
            F.min(ts_col).alias("valid_from"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    w2 = Window.partitionBy(key_col).orderBy("valid_from")
    return (
        runs.withColumn("valid_to", F.lead("valid_from").over(w2))
        .withColumn("is_current", F.col("valid_to").isNull().cast("int"))
        .drop("__run")
    )


def point_in_time_join(
    facts: DataFrame,
    dim: DataFrame,
    key_col: str,
    fact_ts: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    how: str = "inner",
) -> DataFrame:
    """Join each fact row to the dimension version that was valid at the
    fact's timestamp: `valid_from <= ts < valid_to`, with a NULL
    `valid_to` meaning "current". The temporal-correctness lookup every
    training pipeline needs — probing the dimension *as of* the fact's
    event time, so a feature computed for a 2023 sample can never read a
    2024 attribute (point-in-time correctness / leakage safety; the
    standard consumer of `scd2_build`'s half-open intervals).

    `how="left"` keeps facts that predate the key's first version (NULL
    dimension columns).

    Scale shape: the key equality is the join's equi-component, so this
    is one plain hash/sort-merge shuffle on the key — never a
    nested-loop range join. The validity predicate filters the (few)
    versions per key after the match; because SCD2 intervals partition
    time per key, at most ONE version survives per fact — output rows ==
    fact rows (inner: minus pre-history facts), with no fan-out to cap.
    """
    cond = (facts[key_col] == dim[key_col]) & (
        facts[fact_ts] >= dim[valid_from]
    ) & (dim[valid_to].isNull() | (facts[fact_ts] < dim[valid_to]))
    return facts.join(dim, cond, how).drop(dim[key_col])


def dataset_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """Row-level diff of two dataset versions by business key. Output:
    one row per key that differs — (key..., status) with status in
    {'added', 'removed', 'changed'}; identical rows are dropped.

    This is the audit a versioned 100 TB corpus runs between drops: what
    did the new crawl/pipeline version actually change? Payloads are
    collapsed to one md5 per side BEFORE the join, so the full-outer
    join shuffles (key, 32-byte hash) — never the payload columns — and
    equality is a hash compare. md5-of-concat uses an explicit unit
    separator and null sentinel so ('ab','c') never collides with
    ('a','bc') and NULL differs from ''.
    """
    if not key_cols or not compare_cols:
        raise ValueError("key_cols and compare_cols must be non-empty")

    def hashed(df: DataFrame, name: str) -> DataFrame:
        payload = F.md5(
            F.concat_ws(
                "\x1f", *[
                    F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
                    for c in compare_cols
                ]
            )
        )
        return df.select(*key_cols, payload.alias(name))

    o = hashed(old, "__h_old")
    n = hashed(new, "__h_new")
    joined = o.join(n, list(key_cols), "full_outer")
    return joined.select(
        *key_cols,
        F.when(F.col("__h_old").isNull(), F.lit("added"))
        .when(F.col("__h_new").isNull(), F.lit("removed"))
        .when(F.col("__h_old") != F.col("__h_new"), F.lit("changed"))
        .alias("status"),
    ).where(F.col("status").isNotNull())
