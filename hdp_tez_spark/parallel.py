"""Partition-shape helpers shared across operator packages."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    """Fan a narrow input out to the session's default parallelism before
    expression-heavy per-row work. Small dimension-style files arrive as a
    single split (one task does everything); at real scale the source
    already has many splits and this is a near-no-op reshuffle guarded by
    the partition count."""
    # JVM-side partition probe: df._jdf.rdd() avoids the Python-RDD
    # conversion (serializer setup + plan translation) that plain df.rdd
    # pays on every call
    target = df.sparkSession.sparkContext.defaultParallelism
    if df._jdf.rdd().getNumPartitions() >= target:
        return df
    return df.repartition(target)
