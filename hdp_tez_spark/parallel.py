"""Partition-shape helpers shared across operator packages."""

from __future__ import annotations

from pyspark.sql import DataFrame


# Partition-probe memo: df._jdf.rdd() forces physical planning + RDD DAG
# construction of the whole input subtree (~50 ms per call measured r11)
# and spread() sits on the construction path of most text operators, so
# repeated constructions (bench reps, sweeps, composed operators sharing
# a source) re-paid it every time. The count depends only on the plan's
# semantics (same files, same splits), so it is memoized per
# (application, semanticHash) — a ~6 ms key. A hash collision could only
# flip the repartition heuristic, never a result. Bounded: cleared when
# it outgrows a few thousand entries (a session touches a handful of
# sources).
_probe_cache: dict[tuple[str, int], int] = {}


def spread(df: DataFrame) -> DataFrame:
    """Fan a narrow input out to the session's default parallelism before
    expression-heavy per-row work. Small dimension-style files arrive as a
    single split (one task does everything); at real scale the source
    already has many splits and this is a near-no-op reshuffle guarded by
    the partition count."""
    target = df.sparkSession.sparkContext.defaultParallelism
    n = None
    key = None
    try:
        key = (
            df.sparkSession.sparkContext.applicationId,
            df._jdf.queryExecution().analyzed().semanticHash(),
        )
        n = _probe_cache.get(key)
    except Exception:
        pass
    if n is None:
        # JVM-side partition probe: df._jdf.rdd() avoids the Python-RDD
        # conversion (serializer setup) that plain df.rdd pays on top
        n = df._jdf.rdd().getNumPartitions()
        if key is not None:
            if len(_probe_cache) > 4096:
                _probe_cache.clear()
            _probe_cache[key] = n
    if n >= target:
        return df
    return df.repartition(target)
