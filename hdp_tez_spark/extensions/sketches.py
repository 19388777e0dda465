"""Mergeable frequency sketches: a count-min sketch built from
engine-reproducible hashes.

Beyond-reference surface (SURVEY §2.8 — the reference has no expression
layer; its counters are exact per-task tallies). Complements the exact
Misra-Gries heavy hitters (`ranking.heavy_hitters`) and the HLL distinct
sketches (`operators/aggregates.hll_sketches`): the CMS answers point
frequency queries over a keyed stream with O(d*w) state, a hard upper
bound on memory no matter how many distinct keys flow through — the
sketch a 100 TB pipeline keeps per shard and merges by cell-wise
addition (the groupBy below IS the merge).

The d hash rows use the engine-portable md5 scheme
(`('0x' || substr(md5('salt{i}:' || key), 1, 15))::BIGINT % w`), so the
whole sketch — build, merge, and probe — is reproducible in any SQL
engine; the DuckDB oracle replays it verbatim. Guarantee: estimates
never undercount, and overcount <= 2N/w with probability 1 - (1/2)^d
(Cormode & Muthukrishnan 2005).

Scale shape: the build is one partially-aggregated shuffle of at most
d*w cells (map-side combine collapses per-partition duplicates — heavy
keys never fan out); probes equi-join the <= d*w-cell sketch, which AQE
broadcasts unhinted.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hdp_tez_spark.extensions.dedup import _md5_long


def _bucket(key: Column, row: int, w: int, salt: str) -> Column:
    return F.pmod(
        _md5_long(F.concat(F.lit(f"{salt}{row}:"), key.cast("string"))), F.lit(w)
    ).cast("int")


def cms_build(
    df: DataFrame, key_col: str, d: int = 4, w: int = 512, salt: str = "cms"
) -> DataFrame:
    """Build a d x w count-min sketch over one key occurrence per input
    row. Output: (row, bucket, cnt) — at most d*w rows, the sketch in
    mergeable form (union several builds and re-`groupBy` to merge).
    """
    if d <= 0 or w <= 0:
        raise ValueError(f"d and w must be positive, got d={d} w={w}")
    key = F.col(key_col)
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"), _bucket(key, i, w, salt).alias("bucket")
            )
            for i in range(d)
        ]
    )
    return (
        df.select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    d: int = 4,
    w: int = 512,
    salt: str = "cms",
) -> DataFrame:
    """Point-frequency estimates for every probe key:
    est(k) = min over rows i of sketch[i, h_i(k)] (an absent cell is 0).
    Output: (key_col, est). Parameters must match the build.
    """
    key = F.col(key_col)
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"), _bucket(key, i, w, salt).alias("bucket")
            )
            for i in range(d)
        ]
    )
    probe_cells = probes.select(key, F.explode(cells).alias("c")).select(
        key_col, F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket")
    )
    return (
        probe_cells.join(sketch, ["row", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )
