"""Bucketed tables: pre-shuffled storage so equi-joins and aggregations
on the bucket key run with NO exchange at query time.

Reference parity: Hive-on-Tez's CLUSTERED BY ... INTO N BUCKETS +
bucket-map-join — the optimization a Tez warehouse leans on for its
biggest fact-fact joins (SURVEY §2.7: join strategy lives in the client,
Tez only runs the edges). Spark's native bucketing is the same contract:
`bucketBy(n, key)` hashes rows into N files per partition at WRITE time;
a join of two tables bucketed by the same key into the same N needs no
shuffle at READ time, and an equality predicate on the bucket key prunes
to 1/N of the files before the scan starts.

At 100 TB this converts the single most expensive recurring shuffle
(fact-fact join on a shared key, e.g. orders x lineitem on orderkey)
into a zero-exchange sort-merge — paid once at ingest, saved on every
query. The trade: writes must route through the table catalog
(`saveAsTable`) because bucket metadata lives there, and the bucket
count is fixed until a rewrite.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Persist `df` as a bucketed (and optionally per-bucket sorted)
    catalog table. Sorting by the bucket key at write time lets the
    bucketed sort-merge join skip its sort too — the fully pre-paid
    join layout."""
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    w = df.write.mode(mode).format(fmt).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table with its bucket spec attached (plain
    `spark.table` — the catalog carries the spec; this helper exists so
    call sites are explicit about relying on it)."""
    return spark.table(table)
