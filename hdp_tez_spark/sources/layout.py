"""Physical-layout operators: Z-order clustering, small-file compaction,
and per-file statistics — the write-side levers that decide how much of a
100 TB table a query actually reads.

Reference parity: Tez's output layout is whatever the MROutput committer
leaves behind (`tez-mapreduce/.../output/MROutput.java:81`); layout
optimization lives in the clients above it (Hive CLUSTERED BY / ALTER
TABLE CONCATENATE for small files). This module carries those
capabilities as engine operators:

- `zorder_by` — multi-dimensional clustering so range predicates on ANY
  of the cluster keys prune files (single-key sorting — `write_sorted` —
  only prunes its one key);
- `compact_small_files` — the CONCATENATE equivalent: rewrite a
  directory of shuffle-fragmented files into ~target-sized ones, staged
  then swapped;
- `file_stats` — the observable: per-file row counts and key min/max,
  i.e. exactly the footer stats an engine prunes with.

All three are plain DataFrame jobs — no driver-side data, no RDDs.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def zorder_value(
    cols: Sequence[Column],
    mins: Sequence[Column],
    maxs: Sequence[Column],
    bits: int = 12,
) -> Column:
    """Morton (Z-curve) value: each column is scaled to a 2^bits-cell grid
    between its min/max, then the cell numbers' bits are interleaved.
    Pure integer column expressions — whole-stage codegen, no Python.

    bits * len(cols) must fit a signed long (<= 62). Equal-width cells:
    for heavily skewed keys, pre-transform (log, rank via
    `operators.sort.ntile_exact`) before z-ordering — the curve only
    interleaves what it is given.
    """
    n = len(cols)
    if bits * n > 62:
        raise ValueError(f"bits*ncols = {bits * n} exceeds signed-long range")
    cells = []
    top = (1 << bits) - 1
    for c, lo, hi in zip(cols, mins, maxs):
        span = (hi.cast("double") - lo.cast("double"))
        scaled = F.when(
            span > 0,
            F.floor((c.cast("double") - lo.cast("double")) / span * (1 << bits)),
        ).otherwise(F.lit(0))
        cells.append(F.least(scaled.cast("long"), F.lit(top)))
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, cell in enumerate(cells):
            bit = F.shiftright(cell, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
    return z


def zorder_by(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 12,
    partitions: int | None = None,
    out: str = "__z",
) -> DataFrame:
    """Cluster rows along a Z-curve over `cols`: compute the Morton value
    (min/max ride as a 1-row broadcast cross join — never collected),
    range-partition on it, and sort within partitions. Written out, every
    file's footer min/max covers a small hypercube of the key space, so a
    range predicate on ANY clustered column prunes most files — the
    multi-column generalization of `catalog.write_sorted`.

    Cost: one aggregate pass + one range shuffle at write time. The
    Z-column is kept (name `out`) so callers can verify clustering or
    reuse it; drop it before writing if undesired.
    """
    stats = df.groupBy().agg(
        *[F.min(c).alias(f"__min_{i}") for i, c in enumerate(cols)],
        *[F.max(c).alias(f"__max_{i}") for i, c in enumerate(cols)],
    )
    with_z = (
        df.crossJoin(F.broadcast(stats))
        .withColumn(
            out,
            zorder_value(
                [F.col(c) for c in cols],
                [F.col(f"__min_{i}") for i in range(len(cols))],
                [F.col(f"__max_{i}") for i in range(len(cols))],
                bits,
            ),
        )
        .drop(*[f"__min_{i}" for i in range(len(cols))])
        .drop(*[f"__max_{i}" for i in range(len(cols))])
    )
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    return with_z.repartitionByRange(n, F.col(out)).sortWithinPartitions(out)


def file_stats(
    spark: SparkSession, path: str, cols: Sequence[str]
) -> DataFrame:
    """Per-file footer-equivalent statistics: (file, n_rows, min/max of
    each requested column). This is what predicate pushdown prunes with —
    use it to AUDIT a layout (how much would predicate X actually skip?)
    rather than guessing. One scan, aggregated by input_file_name —
    output is |files| rows."""
    df = spark.read.parquet(path)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return (
        df.withColumn("file", F.input_file_name())
        .groupBy("file")
        .agg(*aggs)
    )


def compact_small_files(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 << 20,
    sort_cols: Sequence[str] | None = None,
) -> int:
    """Rewrite a parquet directory into ceil(total_bytes / target_bytes)
    files — Hive's ALTER TABLE CONCATENATE for the small-files problem
    (every streaming sink and over-parallel shuffle write creates it; at
    100 TB a 10x file-count reduction is a 10x reduction in driver
    planning time and NameNode/liststore pressure).

    Sizes come from the filesystem via Hadoop's FileSystem API (works on
    HDFS/S3/local alike); the rewrite is staged to `<path>__compacting`
    and swapped in with two renames (brief non-atomic window — run it in
    a maintenance slot, same contract as Hive concatenate). Passing
    `sort_cols` re-sorts while compacting (compaction is the natural
    moment to fix layout too). Returns the new file count.
    """
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    total = fs.getContentSummary(jpath).getLength()
    n = max(1, math.ceil(total / target_bytes))

    df = spark.read.parquet(path)
    if sort_cols:
        df = df.repartitionByRange(n, *[F.col(c) for c in sort_cols]).sortWithinPartitions(
            *sort_cols
        )
    else:
        df = df.repartition(n)
    staging = path.rstrip("/") + "__compacting"
    trash = path.rstrip("/") + "__old"
    df.write.mode("overwrite").parquet(staging)

    jstaging = jvm.org.apache.hadoop.fs.Path(staging)
    jtrash = jvm.org.apache.hadoop.fs.Path(trash)
    if not fs.rename(jpath, jtrash):
        raise IOError(f"compact: could not move {path} aside")
    if not fs.rename(jstaging, jpath):
        fs.rename(jtrash, jpath)  # roll back
        raise IOError(f"compact: could not swap staging into {path}")
    fs.delete(jtrash, True)
    return n
