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

# Dirs this module already applied, keyed by SparkContext application id:
# requested dir -> the QUALIFIED value the context reported back after
# setCheckpointDir (Spark qualifies the URI and appends a random UUID
# subdir, so the reported value never string-matches the caller's
# argument — naive equality would re-invoke setCheckpointDir, minting a
# fresh UUID dir + an FS mkdirs round-trip, a namenode RPC on HDFS, every
# round of a 25-round iteration). Keeping BOTH sides lets a later call
# detect that something else changed the context dir in between (live
# value no longer matches what we applied) and re-assert the explicit
# argument instead of silently checkpointing into the foreign location.
_applied_dirs: dict[str, tuple[str, str]] = {}


def truncate_lineage(
    df: DataFrame,
    checkpoint_dir: str | None = None,
    eager: bool = True,
) -> DataFrame:
    """Cut `df`'s lineage: reliable `checkpoint` when a directory is
    available (explicit arg, or already configured on the SparkContext),
    `localCheckpoint` otherwise.

    `eager=True` materializes immediately — iterative loops rely on this
    so each round runs exactly one pass (convergence metrics observe the
    materialization). The reliable branch persists the input around an
    EAGER checkpoint to avoid the un-persisted double-compute; with
    `eager=False` there is no safe point to release such a cache, so the
    lazy reliable path accepts the one recompute instead of leaking a
    pinned dataset per call.
    """
    sc = df.sparkSession.sparkContext
    app = sc.applicationId
    jsc = sc._jsc.sc()
    live = jsc.getCheckpointDir()
    live_val = live.get() if live.isDefined() else None
    if checkpoint_dir is not None:
        requested, applied = _applied_dirs.get(app, (None, None))
        if (
            requested != checkpoint_dir
            or applied is None
            or live_val != applied
        ):
            sc.setCheckpointDir(checkpoint_dir)
            new_live = jsc.getCheckpointDir()
            _applied_dirs[app] = (checkpoint_dir, new_live.get())
            live_val = new_live.get()
    if live_val is None:
        return df.localCheckpoint(eager=eager)
    if not eager:
        # lazy reliable checkpoint: no persist — see docstring
        return df.checkpoint(eager=False)
    # Persist before an eager reliable checkpoint: RDD.checkpoint
    # materializes through the action's job and then RECOMPUTES the whole
    # lineage in the checkpoint-writing pass unless the data is cached —
    # the classic un-persisted-checkpoint double-compute. The cache is
    # dropped as soon as the checkpoint files hold the data.
    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    out = df.checkpoint(eager=True)
    df.unpersist()
    return out
