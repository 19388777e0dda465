"""Task-retry fault-injection layer — the engine's analogue of the
reference's end-to-end fault-tolerance suite
(tez-tests/src/test/java/org/apache/tez/test/TestFaultTolerance.java:141-744,
which kills task attempts and asserts the DAG still produces the right
answer). Every "retry-stable by construction" claim in this repo
(md5-deterministic splits, LoopCheckpointer-cut iterative loops) is
asserted here by actually FAILING first task attempts and comparing
bit-identical output against an uninjected run.

Mechanics: Spark only honors task retries in local mode through the
`local[N,maxFailures]` master form — the `spark.task.maxFailures` conf
is ignored by LocalSchedulerBackend — and one JVM can hold one
SparkContext, so these scenarios run in a SUBPROCESS with its own
`local[8,4]` session rather than the shared session fixture. The
injector is a schema-preserving mapPartitions that raises on
`TaskContext.attemptNumber() == 0` for even partition ids, dropping a
marker file per raise (accumulator updates from failed tasks are not
reliably reported, marker files are) so the test can prove failures
actually happened rather than vacuously passing.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

_SCENARIOS = r"""
import json, os, sys, uuid

from pyspark import TaskContext
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

marker_dir = sys.argv[1]

spark = (
    SparkSession.builder.master("local[8,4]")
    .appName("fault-injection")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .config("spark.sql.shuffle.partitions", "8")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")


def inject(df):
    # Schema-preserving pass-through whose tasks die on their FIRST
    # attempt (even partition ids). Each raise drops a marker file so
    # the parent test can assert the fault path was actually exercised;
    # the retry (attemptNumber >= 1) streams the partition through
    # untouched. NOTE: every job that re-evaluates this RDD creates
    # fresh tasks with attemptNumber 0, so iterative consumers re-fail
    # and re-retry per round -- strictly more failures, which is the point.
    schema = df.schema

    def fail_first(idx, it):
        ctx = TaskContext.get()
        if ctx.attemptNumber() == 0 and idx % 2 == 0:
            open(
                os.path.join(marker_dir, f"{idx}-{uuid.uuid4().hex}"), "w"
            ).close()
            raise RuntimeError(f"injected fault: partition {idx} attempt 0")
        return it

    rdd = df.rdd.mapPartitionsWithIndex(fail_first, preservesPartitioning=True)
    return spark.createDataFrame(rdd, schema)


def rows_fingerprint(df):
    # Order-insensitive exact fingerprint: sorted tuple-of-str rows.
    return sorted(tuple(str(v) for v in row) for row in df.collect())


# --- scenario A: md5-deterministic split + downstream shuffle --------
# train_test_split's retry-stability contract (extensions/splits.py:29)
# is that the md5(id) bucket — not rand() — drives assignment, so a
# re-run task labels identically. The groupBy after the injected map
# forces the failed/retried stage to FEED A SHUFFLE, the reference's
# cascading-rerun shape (TestFaultTolerance's two-vertex DAGs).
sys.path.insert(0, os.getcwd())
from hdp_tez_spark.extensions.splits import train_test_split  # noqa: E402
from hdp_tez_spark.extensions.dedup import connected_components  # noqa: E402

base = spark.range(0, 4000, 1, 8).select(
    F.col("id"), F.concat(F.lit("row-"), F.col("id")).alias("key")
)

split_clean = rows_fingerprint(train_test_split(base, "key"))
split_fault = rows_fingerprint(train_test_split(inject(base), "key"))

agg_clean = rows_fingerprint(
    train_test_split(base, "key").groupBy("split").count()
)
agg_fault = rows_fingerprint(
    train_test_split(inject(base), "key").groupBy("split").count()
)

n_markers_after_a = len(os.listdir(marker_dir))

# --- scenario B: LoopCheckpointer-cut iterative loop -----------------
# connected_components (extensions/dedup.py:593) runs multiple
# large-star/small-star rounds, each cutting lineage through
# plans/checkpoints.truncate_lineage. Injecting at the edge input means
# round-1 tasks die and retry; the converged star forest must be
# bit-identical to the clean run. Two chains + one ring exercise
# multi-round convergence (not a single-round trivial graph).
edges = spark.createDataFrame(
    [(i, i + 1) for i in range(0, 60)]          # chain 0..60
    + [(100 + i, 100 + (i + 1) % 40) for i in range(40)]  # ring 100..139
    + [(200, 201), (202, 201)],                  # small tree
    "id_a long, id_b long",
).repartition(8)

cc_clean = rows_fingerprint(connected_components(edges, max_iter=30))
cc_fault = rows_fingerprint(connected_components(inject(edges), max_iter=30))

print(
    json.dumps(
        {
            "split_identical": split_fault == split_clean,
            "agg_identical": agg_fault == agg_clean,
            "cc_identical": cc_fault == cc_clean,
            "split_rows": len(split_clean),
            "cc_rows": len(cc_clean),
            "markers_after_a": n_markers_after_a,
            "markers_total": len(os.listdir(marker_dir)),
        }
    )
)
spark.stop()
"""


@pytest.fixture(scope="module")
def fault_run(tmp_path_factory):
    marker_dir = tmp_path_factory.mktemp("fault_markers")
    proc = subprocess.run(
        [sys.executable, "-c", _SCENARIOS, str(marker_dir)],
        cwd=str(REPO),
        capture_output=True,
        text=True,
        timeout=600,
        env={**os.environ, "PYTHONPATH": str(REPO)},
    )
    assert proc.returncode == 0, f"scenario subprocess failed:\n{proc.stderr[-4000:]}"
    line = proc.stdout.strip().splitlines()[-1]
    return json.loads(line)


def test_failures_were_actually_injected(fault_run):
    # A vacuous pass (injector never fired, nothing retried) must fail
    # loudly: scenario A alone runs >=2 jobs over 4 even partitions.
    assert fault_run["markers_after_a"] >= 2
    assert fault_run["markers_total"] > fault_run["markers_after_a"], (
        "iterative scenario B never re-evaluated the injected input"
    )


def test_md5_split_is_retry_stable(fault_run):
    assert fault_run["split_rows"] == 4000
    assert fault_run["split_identical"], (
        "train_test_split output changed when first task attempts failed"
    )


def test_shuffle_after_failed_map_stage_is_retry_stable(fault_run):
    assert fault_run["agg_identical"], (
        "groupBy over the injected map stage produced different counts"
    )


def test_loopcheckpointer_iteration_is_retry_stable(fault_run):
    assert fault_run["cc_rows"] == 60 + 1 + 40 + 3
    assert fault_run["cc_identical"], (
        "connected_components diverged under task-retry fault injection"
    )
