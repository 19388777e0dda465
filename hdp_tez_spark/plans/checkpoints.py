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

NOTE — `checkpoint_dir` is STICKY session config, exactly like calling
`sc.setCheckpointDir` yourself (Spark has no per-call checkpoint
location): after one operator passes it, later no-kwarg
`truncate_lineage` calls in the same session also take the reliable
branch. That is the intended cluster posture (everything fault-tolerant
once a dir exists); a sandbox that wants the fast path back can reset
with `sc._jsc.sc().setCheckpointDir(None)`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

# Dirs this module already applied, keyed by SparkContext application id.
# Spark qualifies the configured dir and appends a random UUID subdir, so
# the context's reported value never string-matches the caller's argument
# — comparing against it would re-invoke setCheckpointDir (and mint a
# fresh UUID dir + an FS mkdirs round-trip, a namenode RPC on HDFS) every
# round of a 25-round iteration. Remember what WE set instead.
_applied_dirs: dict[str, str] = {}


def truncate_lineage(
    df: DataFrame,
    checkpoint_dir: str | None = None,
    eager: bool = True,
) -> DataFrame:
    """Cut `df`'s lineage: reliable `checkpoint` when a directory is
    available (explicit arg, remembered from an earlier call, or already
    configured on the SparkContext), `localCheckpoint` otherwise.

    `eager=True` materializes immediately — iterative loops rely on this
    so each round runs exactly one pass (convergence metrics observe the
    materialization).
    """
    sc = df.sparkSession.sparkContext
    app = sc.applicationId
    ctx_defined = sc._jsc.sc().getCheckpointDir().isDefined()
    if checkpoint_dir is not None and (
        not ctx_defined or _applied_dirs.get(app) != checkpoint_dir
    ):
        sc.setCheckpointDir(checkpoint_dir)
        _applied_dirs[app] = checkpoint_dir
        ctx_defined = True
    if not ctx_defined:
        return df.localCheckpoint(eager=eager)
    # Persist before a reliable checkpoint: RDD.checkpoint materializes
    # through the action's job and then RECOMPUTES the whole lineage in
    # the checkpoint-writing pass unless the data is cached — the classic
    # un-persisted-checkpoint double-compute. The cache is dropped as
    # soon as the checkpoint files hold the data.
    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    out = df.checkpoint(eager=eager)
    if eager:
        df.unpersist()
    return out
