"""Heavy-family scale probe (VERDICT r07 task #6): run the worst sf1.0
scalers at a LARGER locally-generated scale factor and record wall time
plus shuffle/spill byte counters, so iteration counts and band-join
fan-outs get one more decade of sub-quadratic evidence (or a bug like
r07's static-broadcast OOM surfaces before a cluster finds it).

Usage:
    python tools/make_sf.py /root/repo/.scratch/sf1.0 \
        /root/repo/.scratch/sf3.0 3
    python tools/probe_heavy.py /root/repo/.scratch/sf3.0 \
        cluster_split pagerank embedding_near_dupes

Prints one JSON line per query: wall sec, shuffle read bytes, spill
bytes, output rows. A super-linear blowup shows up as a shuffle-bytes
ratio far above the data ratio, long before wall time alone is
conclusive on throttled hardware.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from hdp_tez_spark.metrics import TaskMetricsCollector
from hdp_tez_spark.session import get_session


def main() -> None:
    args = sys.argv[1:]
    if not args:
        raise SystemExit(
            "usage: python tools/probe_heavy.py <sf_dir> <query> [query ...]"
        )
    sf_dir, names = args[0], args[1:]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))
    spark = get_session("hdp-tez-spark-probe", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    collector = TaskMetricsCollector(spark)
    qs = entry_mod.queries()
    for name in names:
        t0 = time.time()
        collector.measure(
            name,
            lambda: qs[name](spark, sf_dir)
            .write.format("noop")
            .mode("overwrite")
            .save(),
        )
        wall = round(time.time() - t0, 1)
        c = collector.counters.get(name, {})
        print(
            json.dumps(
                {
                    "query": name,
                    "wall_sec": wall,
                    "shuffle_read_bytes": c.get("shuffle_read_bytes"),
                    "shuffle_write_bytes": c.get("shuffle_write_bytes"),
                    "spill_bytes": (c.get("memory_spill_bytes") or 0)
                    + (c.get("disk_spill_bytes") or 0),
                    "sf_dir": sf_dir,
                }
            ),
            flush=True,
        )
        # Same inter-query hygiene as check_correctness/bench: drive the
        # ContextCleaner so one probe's released broadcast/checkpoint
        # blocks don't squeeze the NEXT probe's execution memory (the
        # r10 k_core->label_propagation 125 GB phantom spill).
        import gc

        gc.collect()
        spark.sparkContext._jvm.System.gc()


if __name__ == "__main__":
    main()
