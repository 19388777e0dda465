"""Incremental materialized-aggregate maintenance (rollup tables).

The pre-aggregation pattern every 100 TB pipeline ends up with: raw
events are too big to re-scan per query, so a partitioned rollup table
holds MERGEABLE per-(partition, key) aggregate state — counts and sums,
the algebraic aggregates — and queries read the rollup, not the raw
table. New data merges in one partition-bounded write.

Reference parity: Hive-on-Tez materialized views / daily INSERT
OVERWRITE rollup jobs — each refresh is a Tez DAG writing one partition
through `MROutput` (`tez-mapreduce/.../output/MROutput.java:81`); here
the refresh is `insert_overwrite_partitions` (same commit contract) over
Spark partial aggregates.

Scale shape:
- a delta is collapsed to per-(partition_col, keys) partial state FIRST
  (map-side combine; shuffle ∝ |affected groups|, not |delta rows|);
- only the AFFECTED partitions are rewritten (dynamic partition
  overwrite) — the other ~36 500 day-partitions of a long table are
  never listed, read, or touched;
- `merge` mode folds the delta into existing state (append-only
  ingest); `replace` mode recomputes affected partitions from the delta
  alone (idempotent backfill/re-delivery: applying the same full-day
  delta twice converges instead of double-counting).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdp_tez_spark.sources.catalog import insert_overwrite_partitions

#: mergeable state columns maintained per (partition, keys) group
STATE_COLS = ("cnt", "total")


def rollup_state(
    delta: DataFrame,
    partition_col: str,
    key_cols: Sequence[str],
    value_col: str,
) -> DataFrame:
    """Collapse raw rows to mergeable aggregate state:
    (partition_col, keys..., cnt, total). Algebraic only — cnt and sum
    merge by addition; avg is derived at read time (sum/cnt), never
    stored (stored averages don't merge)."""
    return delta.groupBy(partition_col, *key_cols).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col(value_col).cast("double")).alias("total"),
    )


def apply_delta(
    spark: SparkSession,
    state_path: str,
    delta: DataFrame,
    partition_col: str,
    key_cols: Sequence[str],
    value_col: str,
    mode: str = "merge",
) -> None:
    """Fold a delta of raw rows into the persisted rollup table.

    mode="merge": existing state of the affected partitions is read,
    summed with the delta's partials, and the affected partitions are
    rewritten — correct for append-only deltas.
    mode="replace": affected partitions are rewritten from the delta's
    partials alone — correct (and replay-idempotent) when the delta
    carries the COMPLETE data for its partitions (backfill/re-delivery).

    Either way only the partitions present in the delta are touched.
    """
    if mode not in ("merge", "replace"):
        raise ValueError(f"unknown mode {mode!r}")
    partial = rollup_state(delta, partition_col, key_cols, value_col)
    if mode == "merge" and _exists(spark, state_path):
        affected = partial.select(partition_col).distinct()
        existing = spark.read.parquet(state_path).join(
            F.broadcast(affected), partition_col
        )
        partial = (
            existing.unionByName(partial)
            .groupBy(partition_col, *key_cols)
            .agg(F.sum("cnt").alias("cnt"), F.sum("total").alias("total"))
        )
    insert_overwrite_partitions(partial, state_path, [partition_col])


def read_rollup(
    spark: SparkSession, state_path: str, derive_avg: bool = True
) -> DataFrame:
    """The queryable rollup; avg derived from the mergeable state."""
    df = spark.read.parquet(state_path)
    if derive_avg:
        df = df.withColumn("avg", F.col("total") / F.col("cnt"))
    return df


def _exists(spark: SparkSession, path: str) -> bool:
    # driver-side FS probe through Hadoop's FileSystem so the check works
    # on any supported scheme (local, HDFS, object stores), not just the
    # local disk os.path can see
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(conf).exists(p)
