"""Join operators.

Reference parity map (SURVEY §2.7):

- Broadcast hash join: `tez-examples/.../HashJoinExample.java:74` builds a
  hash table from the broadcast edge (:218-236) and stream-probes the big
  side (:304-341). Here: `big.join(broadcast(small), ...)` — Catalyst emits
  BroadcastHashJoinExec; unlike Tez, the broadcast decision is automatic
  (autoBroadcastJoinThreshold + AQE runtime demotion), but the manual flag
  is preserved via the `strategy` argument.
- Shuffle hash join: `HashJoinExample.java:201-216` hash-partitions both
  sides through `UnorderedPartitionedKVEdgeConfig`. Here: SHUFFLE_HASH hint.
- Sort-merge join: `tez-examples/.../SortMergeJoinExample.java:72` routes
  both sides through sorted edges (:206-227) and merge-joins the grouped
  streams (:241+). Here: MERGE hint (Spark's default for large equi-joins).
- Semi/anti: the Tez examples emit only the probe key on match — a semi
  join; `JoinValidate` (`tez-examples/.../JoinValidate.java:54,139-168`) is
  a symmetric anti-join count. Here: 'leftsemi'/'leftanti' join types.
- Cross/theta/range joins: absent in Tez 0.7 (CartesianProductEdgeManager is
  0.9+); included for engine-surface completeness.

Scale notes: with AQE on, a misestimated shuffle join converts to broadcast
at runtime, and skewed partitions are split (skewJoin). For repeated
big-big joins on the same key, pre-bucketing both tables on the join key
(`df.write.bucketBy(n, key)`) removes the shuffle entirely — the Spark
analogue of Tez jobs sharing a persisted partitioned edge.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Strategy = str  # 'broadcast' | 'shuffle_hash' | 'merge' | 'auto'

_HINTS = {
    "broadcast": "BROADCAST",
    "shuffle_hash": "SHUFFLE_HASH",
    "merge": "MERGE",
}


def equi_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str] | Column,
    how: str = "inner",
    strategy: Strategy = "auto",
) -> DataFrame:
    """Equi-join with an explicit physical-strategy override.

    `strategy` mirrors Tez's per-DAG manual choice (`HashJoinExample.java:78-103`
    `doBroadcast`); 'auto' lets Catalyst/AQE decide — the better default.
    The hint is applied to the *right* side (the build side in the Tez
    examples).
    """
    if strategy != "auto":
        right = right.hint(_HINTS[strategy])
    return left.join(right, on=on, how=how)


def broadcast_join(
    left: DataFrame, right_small: DataFrame, on: str | Sequence[str] | Column, how: str = "inner"
) -> DataFrame:
    """Explicit broadcast hash join (`HashJoinExample.java:218-236`)."""
    return left.join(F.broadcast(right_small), on=on, how=how)


def semi_join(left: DataFrame, right: DataFrame, on: str | Sequence[str] | Column) -> DataFrame:
    """Emit left rows whose key exists in right (probe-emit semantics of
    `HashJoinProcessor`, `HashJoinExample.java:304-341`)."""
    return left.join(right, on=on, how="leftsemi")


def anti_join(left: DataFrame, right: DataFrame, on: str | Sequence[str] | Column) -> DataFrame:
    """Emit left rows whose key is missing from right."""
    return left.join(right, on=on, how="leftanti")


def join_validate(
    left: DataFrame, right: DataFrame, on: Sequence[str]
) -> DataFrame:
    """Symmetric difference count — parity with `JoinValidate.java:54`:
    returns one row per side with the count of keys present only there.
    Empty-difference == the two datasets join cleanly.
    """
    lo = left.select(*on).distinct()
    ro = right.select(*on).distinct()
    only_left = lo.join(ro, on=list(on), how="leftanti").agg(
        F.lit("left_only").alias("side"), F.count(F.lit(1)).alias("missing")
    )
    only_right = ro.join(lo, on=list(on), how="leftanti").agg(
        F.lit("right_only").alias("side"), F.count(F.lit(1)).alias("missing")
    )
    return only_left.unionAll(only_right)


def cross_join(left: DataFrame, right: DataFrame) -> DataFrame:
    """Cartesian product (beyond-reference surface)."""
    return left.crossJoin(right)


def range_join(
    left: DataFrame,
    right: DataFrame,
    condition: Column,
    how: str = "inner",
) -> DataFrame:
    """Non-equi (theta/range) join (beyond-reference surface).

    At scale, prefer adding a coarse equi bucket (e.g. truncate both
    time columns to the same granularity and join on the bucket plus the
    range predicate) so Catalyst gets an equi-component to shuffle on —
    see `bucketed_interval_join`.
    """
    return left.join(right, on=condition, how=how)


def salted_join(
    left_skewed: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-mitigated equi-join: the skewed (left) side gets a random salt
    in [0, salt_buckets); the right side is exploded across every salt
    value, so each hot key's rows spread over `salt_buckets` reducers.

    This is the manual fallback for skew AQE can't fix (e.g. a single key
    larger than an executor). Results are identical to a plain join; cost
    is `salt_buckets`x replication of the right side — keep it for
    genuinely small-ish right sides or pre-filter to the hot keys.
    Tez analogue: a custom EdgeManagerPlugin routing
    (`tez-api/.../dag/api/EdgeManagerPlugin.java:36-143`) — here it is
    pure column algebra.

    The salt is a *deterministic* hash of the whole left row — never
    ``F.rand``: a random salt is recomputed on task retry, and if the
    upstream shuffle replays rows in a different order the same row can
    land in a different bucket, silently dropping or duplicating join
    output on a real cluster.

    Only left-preserving joins are allowed. With 'right'/'full_outer',
    an unmatched right row would be emitted once per salt bucket
    (the explode replicates it `salt_buckets` times), breaking the
    plain-join equivalence this wrapper promises.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join preserves plain-join semantics only for {sorted(allowed)}; "
            f"got how={how!r} (unmatched right rows would be duplicated "
            f"{salt_buckets}x by the salt explode)"
        )
    keys = list(on)
    l = left_skewed.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in left_skewed.columns]),
               F.lit(salt_buckets)).cast("int"),
    )
    r = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    joined = l.join(r, on=[*keys, "__salt"], how=how)
    return joined.drop("__salt")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    values: Sequence[str],
    count_name: str | None = None,
) -> DataFrame:
    """As-of join: attach to every left row the `values` columns of the
    *latest* right row with ``right_ts <= left_ts`` in the same key group
    (backward direction; a right row exactly at left_ts matches).

    Absent in the reference (Tez 0.7 has no temporal operators at all —
    SURVEY §2.7 lists theta/range/as-of as "Absent"); included as
    beyond-reference surface for time-series workloads.

    Implementation is the scale-correct one: instead of an exploding
    range join (left x all-earlier-right, then max), both sides are
    tagged and unioned, shuffled ONCE on the key, sorted by (ts, tag)
    within partitions, and the right-row values are carried forward with
    `last(..., ignorenulls=True)` over a running window. Cost is one
    shuffle of |left|+|right| rows — no quadratic blowup on hot keys,
    which is what makes this viable on 100 TB of events.

    `count_name`, if given, adds a running count of matched right rows
    (how many right events precede each left row).

    Left/`values` column names must be disjoint. Right rows that tie on
    (key, right_ts) make the attached values order-dependent — dedup the
    right side first if ties are possible.

    The attached values ride in ONE non-null marker struct per right row,
    so the latest matching right row wins even when some (or all) of its
    `values` columns are NULL — per-column `last(v, ignorenulls=True)`
    would skip a genuine NULL and carry a stale older value forward, and
    could even mix columns from *different* right rows.
    """
    from pyspark.sql import Window

    keys = list(on)
    r = right.select(
        *keys,
        F.col(right_ts).alias("__t"),
        F.struct(*[F.col(v) for v in values]).alias("__vals"),
    ).withColumn("__tag", F.lit(0))
    l = left.withColumn("__tag", F.lit(1)).withColumn("__t", F.col(left_ts))
    # unionByName fills each side's missing columns with typed NULLs
    u = l.unionByName(r, allowMissingColumns=True)
    # right rows (tag 0) sort before left rows at the same timestamp, so an
    # exactly-simultaneous right row is visible to the left row
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__t"), F.col("__tag"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("__vals", F.last("__vals", ignorenulls=True).over(w))
    for v in values:
        u = u.withColumn(v, F.col("__vals").getField(v))
    if count_name is not None:
        u = u.withColumn(
            count_name, F.sum(F.when(F.col("__tag") == 0, 1).otherwise(0)).over(w)
        )
    return u.where(F.col("__tag") == 1).drop("__tag", "__t", "__vals")


def full_outer_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str] | Column,
) -> DataFrame:
    """Full outer join — rows from both sides, nulls where unmatched.
    Beyond-reference surface (Tez examples only build inner/semi joins)."""
    return left.join(right, on=on, how="full_outer")


def bucketed_interval_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_start: str,
    right_end: str,
    bucket_seconds: int,
) -> DataFrame:
    """Scalable point-in-interval join: explode each right interval into the
    coarse time buckets it spans, equi-join on the bucket (shuffle on an
    equi key instead of a cartesian nested-loop), then post-filter the exact
    range predicate. The standard rewrite that makes range joins viable at
    100 TB.
    """
    bucket = lambda c: (F.unix_timestamp(F.col(c)) / bucket_seconds).cast("long")  # noqa: E731
    r = right.withColumn(
        "__bucket",
        F.explode(F.sequence(bucket(right_start), bucket(right_end))),
    )
    l = left.withColumn("__bucket", bucket(left_ts))
    joined = l.join(r, on="__bucket").where(
        (F.col(left_ts) >= F.col(right_start)) & (F.col(left_ts) <= F.col(right_end))
    )
    return joined.drop("__bucket")


def null_safe_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    how: str = "inner",
) -> DataFrame:
    """Equi-join under null-safe equality (`<=>` / IS NOT DISTINCT FROM):
    NULL keys match each other instead of silently dropping.

    Tez itself has no join semantics (clients like Hive/Pig lower joins
    onto its edges — SURVEY §2.7); Hive's join grammar includes `<=>`,
    so the engine surface carries it too. Catalyst plans `<=>` as an
    ordinary hash-join key (EqualNullSafe is an equi-join condition, not
    a theta filter), so this shuffles/broadcasts exactly like `=` —
    with the usual caveat that a heavy NULL stripe is a skew key; salt
    it with `salted_join` if NULLs dominate.
    """
    return left.join(
        right, on=left[left_key].eqNullSafe(right[right_key]), how=how
    )
