"""Production-path probe for embedding_near_dupes (VERDICT r07 task #6
follow-up): the registry query pins n_planes=4 for oracle parity, but the
production default is n_planes=None (corpus-size-derived plane count —
added r08 after the x3 probe showed any FIXED plane count is quadratic
across corpus growth). This probe measures THAT path at two scales so the
~linear-candidate-work claim is a number, not a docstring.

Usage:
    python tools/probe_ann.py <sf_dir> [<sf_dir> ...]

Prints one JSON line per dir: corpus rows, derived plane count, near-dup
pairs found, wall sec, shuffle bytes.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hdp_tez_spark.extensions.similarity import embedding_near_dupes
from hdp_tez_spark.metrics import TaskMetricsCollector
from hdp_tez_spark.session import get_session
from hdp_tez_spark.sources.catalog import load_table


def main() -> None:
    dirs = sys.argv[1:]
    if not dirs:
        raise SystemExit("usage: python tools/probe_ann.py <sf_dir> [...]")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))
    spark = get_session("hdp-tez-spark-probe-ann", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    collector = TaskMetricsCollector(spark)
    for d in dirs:
        emb = load_table(spark, d, "embeddings")
        n = emb.count()
        t0 = time.time()
        res = embedding_near_dupes(emb, threshold=0.4, n_planes=None)
        out: dict[str, int] = {}

        def run() -> None:
            out["pairs"] = res.count()

        collector.measure(f"ann:{d}", run)
        wall = round(time.time() - t0, 1)
        c = collector.counters.get(f"ann:{d}", {})
        print(
            json.dumps(
                {
                    "sf_dir": d,
                    "corpus_rows": n,
                    "pairs": out["pairs"],
                    "wall_sec": wall,
                    "shuffle_read_bytes": c.get("shuffle_read_bytes"),
                    "spill_bytes": (c.get("memory_spill_bytes") or 0)
                    + (c.get("disk_spill_bytes") or 0),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
