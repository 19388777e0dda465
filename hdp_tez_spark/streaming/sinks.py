"""Streaming sinks with transactional multi-output commit, and the
stream admission gate a continuously-ingesting corpus needs.

Beyond-reference surface on the streaming side of the same contract the
batch `Pipeline.run_and_commit` implements (DAG-success output commit,
`tez-dag/.../dag/impl/DAGImpl.java` commitOrAbortOutputs): a micro-batch
that feeds several sinks must publish to all of them or none, and a
replayed micro-batch (restart after a crash between write and
checkpoint advance) must not double-publish.
"""

from __future__ import annotations

import uuid
from collections.abc import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamWriter


def stream_corpus_gate(
    stream_docs: DataFrame,
    corpus_index: DataFrame,
    text_col: str = "text",
    fp_col: str = "fp_md5",
) -> DataFrame:
    """Admission gate for a document stream: drop incoming docs whose
    exact content fingerprint already exists in the (static) corpus
    index — streaming exact-dedup against everything already ingested,
    via a stream-static left_anti join.

    The index side is `fingerprint()`'s output (or any frame with a
    `fp_md5` column); at scale it is a parquet/Delta table the batch
    pipeline maintains, re-read per micro-batch so newly-committed
    corpus grows the gate without restarting the stream. State is zero:
    nothing accumulates in the stream's own state store (contrast
    `stream_dedup`, which dedups the stream against *itself*).
    """
    from hdp_tez_spark.extensions.textstats import normalized_fp

    tagged = stream_docs.withColumn("__fp", normalized_fp(F.col(text_col)))
    idx = corpus_index.select(F.col(fp_col).alias("__fp")).distinct()
    return tagged.join(idx, "__fp", "left_anti").drop("__fp")


def commit_batch(
    batch_df: DataFrame,
    batch_id: int,
    sinks: Mapping[str, str],
    fmt: str = "parquet",
) -> dict[str, str]:
    """Write one micro-batch to every sink with all-or-nothing visibility
    and replay idempotence.

    Each sink receives the batch at `<path>/batch=<id>`; the batch writes
    to hidden staging dirs first and renames all of them only after every
    write succeeded (HDFS rename = metadata-only). If ANY target already
    exists the whole batch is treated as already committed and skipped —
    that is what makes checkpoint-replay exactly-once: a crash after
    rename but before checkpoint advance replays the batch id, finds the
    target, and does nothing.

    Returns {sink_name: committed_path} ({} on replay skip).
    """
    spark = batch_df.sparkSession
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    HPath = jvm.org.apache.hadoop.fs.Path

    def fs_for(p: str):
        return HPath(p).getFileSystem(hconf)

    targets = {
        name: f"{path.rstrip('/')}/batch={batch_id}" for name, path in sinks.items()
    }
    if any(fs_for(t).exists(HPath(t)) for t in targets.values()):
        return {}
    token = uuid.uuid4().hex[:12]
    staged = {
        name: f"{path.rstrip('/')}/.staging-{batch_id}-{token}"
        for name, path in sinks.items()
    }
    # one computation of the batch feeds every sink
    batch_df.persist()
    try:
        for name in sinks:
            batch_df.write.format(fmt).mode("overwrite").save(staged[name])
    except Exception:
        for p in staged.values():
            fs = fs_for(p)
            if fs.exists(HPath(p)):
                fs.delete(HPath(p), True)
        raise
    finally:
        batch_df.unpersist()
    committed: dict[str, str] = {}
    for name in sinks:
        fs = fs_for(targets[name])
        if not fs.rename(HPath(staged[name]), HPath(targets[name])):
            raise IOError(f"commit rename failed: {staged[name]} -> {targets[name]}")
        committed[name] = targets[name]
    return committed


def stream_to_sinks(
    sdf: DataFrame,
    sinks: Mapping[str, str],
    checkpoint: str,
    fmt: str = "parquet",
) -> DataStreamWriter:
    """foreachBatch writer publishing every micro-batch to all `sinks`
    transactionally via `commit_batch`. Caller starts it (`.trigger(...)
    .start()` or `availableNow`); the checkpoint dir carries the stream's
    progress, and batch-dir existence carries publish state — together
    they give exactly-once multi-sink output across restarts.
    """
    sinks = dict(sinks)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        commit_batch(batch_df, batch_id, sinks, fmt)

    return sdf.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint
    )
