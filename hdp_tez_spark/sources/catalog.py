"""Table sources: the engine's DataSource/DataSink surface.

Reference parity: Tez reads external data through `MRInput`
(`tez-mapreduce/.../input/MRInput.java:84`) and writes through `MROutput`
(`tez-mapreduce/.../output/MROutput.java:81`), with split grouping handled
by `TezMapReduceSplitsGrouper.java:161-168`. In Spark all of that is the
DataFrame reader/writer; this module pins the engine's table catalog over
the driver's parquet layout and registers temp views so `spark.sql` works
against the same names DuckDB uses as oracle views.

Scale note: `spark.read.parquet` plans splits driver-side with
`maxPartitionBytes` packing — the direct analogue of Tez's grouped splits —
and pushes filters/column pruning into the scan, which Tez cannot do at all
(it has no expression layer). At 100 TB the parquet footer pruning +
predicate pushdown is the difference between reading 100 TB and reading the
few columns/row-groups a query touches.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _ns_timestamp_columns(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS) — Spark cannot read those
    natively, so they are read as int64 nanos and cast (footer-only probe,
    driver-side, O(files-listed) not O(data)).

    The arrow-schema unit alone is NOT sufficient: pyarrow also reports
    legacy INT96 timestamps (Spark's own default parquet writer format)
    as timestamp[ns], but Spark reads INT96 natively — applying the
    nanos-as-long cast to those breaks analysis. So a column is flagged
    only when its PHYSICAL type in the parquet footer is INT64.

    Footer probing details: only TOP-LEVEL columns are candidates (the
    nanosAsLong cast applies to top-level schema fields), so the physical
    map is keyed by the footer column's full dotted PATH, not its leaf
    name — a nested struct leaf that happens to share a top-level
    column's name ("meta.ts" vs "ts") can no longer shadow it. And
    because a multi-file directory may contain heterogeneous parts
    (schema evolution / mixed writers), up to three files are probed and
    a column is flagged only when every probed footer agrees on INT64 —
    a mixed INT64/INT96 directory fails loudly at read time rather than
    silently mis-casting (no single cast is correct for it)."""
    import pyarrow.dataset as ds
    import pyarrow.parquet as pq
    import pyarrow.types as pat

    dataset = ds.dataset(path, format="parquet")
    schema = dataset.schema
    ns_names = [
        f.name
        for f in schema
        if pat.is_timestamp(f.type) and f.type.unit == "ns"
    ]
    if not ns_names:
        return []
    flagged = set(ns_names)
    for fpath in list(dataset.files)[:3]:
        meta = pq.ParquetFile(fpath).metadata.schema
        # path is the full dotted path ("parent.child" for nested leaves);
        # a top-level column's path equals its name
        physical = {
            meta.column(i).path: meta.column(i).physical_type
            for i in range(meta.num_columns)
        }
        flagged &= {n for n in flagged if physical.get(n) == "INT64"}
        if not flagged:
            break
    # preserve schema order for deterministic read plans
    return [n for n in ns_names if n in flagged]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one catalog table from the given scale-factor directory.

    Parquet TIMESTAMP(NANOS) columns are transparently converted to Spark
    microsecond timestamps: Spark has no nanos timestamp type, so they are
    read as int64 via ``spark.sql.legacy.parquet.nanosAsLong`` and truncated
    ns -> us (the driver's generator emits microsecond-precision values, so
    this is lossless).

    Parquet naive timestamps (``timestamp[us]`` with no timezone, e.g.
    ``events.ts``) are read by Spark 4 as TIMESTAMP_NTZ, which cannot be
    cast to numeric and is rejected by ``withWatermark`` — so every NTZ
    column is normalized to session-tz TIMESTAMP_LTZ. The session timezone
    is pinned to UTC first, so the naive wall-clock value maps to the same
    instant DuckDB's naive ``epoch(ts)`` computes; downstream
    ``unix_timestamp``/``cast(double)``/watermark semantics all work and
    oracle comparisons are unchanged.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; catalog has {TABLES}")
    path = f"{sf_dir}/{name}.parquet"
    ns_cols = _ns_timestamp_columns(path)
    # Derived fields (year/window buckets/epoch) of LTZ timestamps depend on
    # the session timezone. Pin UTC before reading so results are
    # deterministic regardless of the caller session's timezone (oracle
    # engines treat these columns as naive).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if ns_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in ns_cols:
        # integer `div`, not `/`: float division of >2^53 nanos loses ULPs
        # and can round *up* across a microsecond boundary
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    ntz_cols = [
        f.name for f in df.schema.fields if isinstance(f.dataType, T.TimestampNTZType)
    ]
    for c in ntz_cols:
        df = df.withColumn(c, F.to_timestamp_ltz(F.col(c)))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every catalog table as a temp view (for spark.sql use)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
    """Sink: atomic parquet write (MROutput + commit-protocol parity).

    Tez commits through `MROutputCommitter` at vertex or DAG success
    (`tez-dag/.../dag/impl/DAGImpl.java` commitOrAbortOutputs); Spark's
    FileCommitProtocol provides the same atomicity per write.
    """
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Sink: newline-delimited JSON (MROutput with TextOutputFormat
    parity — `tez-mapreduce/.../output/MROutput.java:81`). One JSON
    object per line, splittable at scale like any text source."""
    df.write.mode(mode).json(path)


def read_json(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    """Source: JSON-lines scan (MRInput reads any InputFormat —
    `tez-mapreduce/.../input/MRInput.java:84`).

    Always pass `schema` in production: without it Spark runs a full
    sampling pass over the files to infer one — at 100 TB that is an
    entire extra job before the query starts.
    """
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.json(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Sink: ORC columnar write (Hive-on-Tez's native format;
    OrcOutputFormat parity). Same FileCommitProtocol atomicity as the
    parquet sink."""
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """Source: ORC scan with predicate pushdown + column pruning —
    filters reach the stripe-level min/max index, so an ORC fact table
    prunes like parquet row-groups (OrcInputFormat parity)."""
    return spark.read.orc(path)


def insert_overwrite_partitions(df: DataFrame, path: str, partition_by: list[str]) -> None:
    """INSERT OVERWRITE with *dynamic* partition replacement: only the
    partitions present in `df` are rewritten; all other partitions under
    `path` survive untouched.

    Reference parity: Hive-on-Tez dynamic partition insert — the
    partition columns route rows to per-partition `MROutput` committers
    and DAG-success commit swaps exactly the written partitions
    (`tez-mapreduce/.../output/MROutput.java:81`,
    `tez-dag/.../dag/impl/DAGImpl.java` commitOrAbortOutputs). Spark's
    `partitionOverwriteMode=dynamic` is the same contract on the
    FileCommitProtocol.

    Scale note: this is THE idempotent backfill primitive at 100 TB — a
    day's re-run replaces that day's partitions atomically without
    touching (or even listing) the other ~36 500 day-partitions of a
    100-year-day table. Static overwrite mode would truncate the whole
    table root; never use it for backfill.

    The session conf is restored afterwards so a shared session keeps
    its configured default.
    """
    spark = df.sparkSession
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, "static")
    spark.conf.set(key, "dynamic")
    try:
        df.write.mode("overwrite").partitionBy(*partition_by).parquet(path)
    finally:
        spark.conf.set(key, prev)


def write_sorted(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    mode: str = "overwrite",
    partitions: int | None = None,
) -> None:
    """Range-sorted parquet layout for data skipping: repartitionByRange
    puts disjoint key ranges in each task, sortWithinPartitions orders
    rows inside, so every output file's min/max footer stats cover a
    non-overlapping slice of the sort key. Any engine (Spark, DuckDB,
    Trino) can then prune whole files on a range predicate — the
    cheap-and-portable cousin of a clustered table format, and the layout
    that turns a 100 TB time-keyed fact table into
    read-only-what-you-query.

    Cost: one range shuffle (sampled boundaries) at write time — paid
    once, saved on every subsequent scan.
    """
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    (
        df.repartitionByRange(n, *[F.col(c) for c in sort_cols])
        .sortWithinPartitions(*sort_cols)
        .write.mode(mode)
        .parquet(path)
    )
