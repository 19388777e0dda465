"""Lineage truncation for iterative DataFrame algorithms.

Every iterative operator in this engine (connected components, PageRank,
BFS, the PPJoin candidate pipeline) must cut its logical plan once per
round or the plan grows without bound. Two ways to cut it:

- `localCheckpoint()` — blocks cached on executor local storage. Fast
  (no DFS write) but NOT fault-tolerant: losing an executor loses its
  blocks, and because the lineage was truncated Spark cannot recompute
  them — the job dies mid-iteration. Fine for a sandbox or short jobs.
- `checkpoint()` to a reliable directory (HDFS/S3/DBFS) — survives
  executor loss; the job resumes from the persisted round. This is the
  right mode for a 1000-executor cluster where SOME executor dying
  during a 40-round job is the expected case, not the edge case.

Reference parity: Tez models the same choice on the edge — an ephemeral
output served by the producer vs a re-fetchable `PERSISTED` /
`PERSISTED_RELIABLE` edge output that survives container loss
(`tez-api/.../dag/api/EdgeProperty.java:71-77`).

`truncate_lineage` picks automatically: an explicit `checkpoint_dir`
argument (threaded through the iterative operators' kwargs) or a
checkpoint dir already configured on the SparkContext upgrades the cut
to a reliable checkpoint; otherwise it falls back to `localCheckpoint`.
A cluster deployment therefore needs ONE line —
`sc.setCheckpointDir("hdfs://...")` — to make every iterative operator
in the engine fault-tolerant, with zero code changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def truncate_lineage(
    df: DataFrame,
    checkpoint_dir: str | None = None,
    eager: bool = True,
) -> DataFrame:
    """Cut `df`'s lineage: reliable `checkpoint` when a directory is
    available (explicit arg wins; else the SparkContext's configured
    checkpoint dir), `localCheckpoint` otherwise.

    `eager=True` materializes immediately — iterative loops rely on this
    so each round runs exactly one job (convergence metrics observe the
    checkpoint job itself).
    """
    sc = df.sparkSession.sparkContext
    if checkpoint_dir is not None:
        current = sc._jsc.sc().getCheckpointDir()
        if not (current.isDefined() and current.get() == checkpoint_dir):
            sc.setCheckpointDir(checkpoint_dir)
        return df.checkpoint(eager=eager)
    if sc._jsc.sc().getCheckpointDir().isDefined():
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
