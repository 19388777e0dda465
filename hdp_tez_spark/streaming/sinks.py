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
from collections.abc import Mapping, Sequence

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


def read_snapshot(spark, table_dir: str, fmt: str = "parquet") -> DataFrame | None:
    """Load the current version of a `stream_merge_upsert` table, or None
    before the first publish. Readers only ever see fully-written
    versions: the _LATEST pointer is renamed into place after the
    version directory is complete."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    HPath = jvm.org.apache.hadoop.fs.Path
    pointer = HPath(f"{table_dir}/_LATEST")
    fs = pointer.getFileSystem(conf)
    if not fs.exists(pointer):
        return None
    stream = fs.open(pointer)
    try:
        version = jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        ).strip()
    finally:
        stream.close()
    return spark.read.format(fmt).load(f"{table_dir}/{version}")


def stream_merge_upsert(
    sdf: DataFrame,
    table_dir: str,
    key_cols: Sequence[str],
    seq_col: str,
    checkpoint: str,
    op_col: str = "op",
    fmt: str = "parquet",
) -> DataStreamWriter:
    """Streaming CDC apply: every micro-batch of change rows is merged
    into a versioned snapshot table with `cdc.merge_upsert` (latest-wins
    by `seq_col`, op 'D' deletes) and published atomically — the merged
    result is written to `{table_dir}/v{batch_id}` and the `_LATEST`
    pointer file is renamed over only after the write completes, so
    readers (`read_snapshot`) never observe a torn table. Batch-replay
    after a crash is idempotent: an existing version directory is
    re-pointed, not re-written.

    This is the streaming half of the CDC surface (Hive MERGE on Tez at
    micro-batch latency). Scale shape per batch = merge_upsert's: the
    window shuffles only the change batch; the snapshot moves through an
    anti-join + union and a rewrite — on a real deployment the rewrite
    is the table-format layer's job (Delta/Iceberg MERGE), and this
    operator is that contract over plain parquet.
    """
    keys = list(key_cols)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        from hdp_tez_spark.extensions.cdc import merge_upsert

        spark = batch_df.sparkSession
        jvm = spark.sparkContext._jvm
        conf = spark.sparkContext._jsc.hadoopConfiguration()
        HPath = jvm.org.apache.hadoop.fs.Path
        fs = HPath(table_dir).getFileSystem(conf)
        version = f"v{batch_id:010d}"
        vdir = HPath(f"{table_dir}/{version}")
        payload = [c for c in batch_df.columns if c not in (op_col, seq_col)]
        if not fs.exists(vdir):
            base = read_snapshot(spark, table_dir, fmt)
            if base is None:
                base = spark.createDataFrame(
                    [], batch_df.select(*payload).schema
                )
            merged = merge_upsert(base, batch_df, keys, seq_col, op_col)
            merged.write.format(fmt).mode("errorifexists").save(
                f"{table_dir}/{version}"
            )
        # atomic publish: write pointer aside, rename into place
        tmp = HPath(f"{table_dir}/_LATEST.{batch_id}.tmp")
        out = fs.create(tmp, True)
        try:
            out.write(bytearray(version.encode()))
        finally:
            out.close()
        latest = HPath(f"{table_dir}/_LATEST")
        if fs.exists(latest):
            fs.delete(latest, False)
        if not fs.rename(tmp, latest):
            raise IOError(f"pointer publish failed for {version}")

    return sdf.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint
    )
