"""Per-query optimization profiler (OPTIMIZATION_r10 measurement loop).

For each named registry query: run it N times through the noop sink in
one tuned session (bench.py methodology — the q_() call itself is inside
the timed window because iterative operators execute during
construction), record every rep's wall seconds, and dump the FINAL
returned DataFrame's `.explain("formatted")` to plans/<tag>/<q>_<suffix>.txt.

Usage:
    python tools/profile_queries.py --reps 3 --suffix before q1 q2 ...
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 ... (same env contract as bench)

Timings go to stdout as one JSON line per query:
    {"query": ..., "reps": [...], "median": ..., "shuffle_mb": ..., "spill_mb": ...}
"""

from __future__ import annotations

import json
import gc
import os
import statistics
import sys
import time
import warnings

warnings.filterwarnings("ignore", category=FutureWarning)
_pw = os.environ.get("PYTHONWARNINGS", "")
if "ignore::FutureWarning" not in _pw:
    os.environ["PYTHONWARNINGS"] = _pw + ("," if _pw else "") + "ignore::FutureWarning"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from hdp_tez_spark.metrics import TaskMetricsCollector
from hdp_tez_spark.session import get_session, warm_up


def main() -> None:
    args = sys.argv[1:]
    reps = 3
    suffix = "before"
    plans_dir = None
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        args = args[:i] + args[i + 2 :]
    if "--suffix" in args:
        i = args.index("--suffix")
        suffix = args[i + 1]
        args = args[:i] + args[i + 2 :]
    if "--plans-dir" in args:
        i = args.index("--plans-dir")
        plans_dir = args[i + 1]
        args = args[:i] + args[i + 2 :]
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if plans_dir is None:
        plans_dir = os.path.join(here, "plans", "r10")
    os.makedirs(plans_dir, exist_ok=True)

    spark = get_session("hdp-tez-profile", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    warm_up(spark)
    qs = entry_mod.queries()
    collector = TaskMetricsCollector(spark)
    out = {}
    for name in names:
        if name not in qs:
            print(json.dumps({"query": name, "error": "not in registry"}))
            continue
        ts = []
        plan_txt = None
        for r in range(reps):
            spark.sparkContext.setJobDescription(f"profile:{name}:rep{r}")

            def act() -> None:
                t0 = time.time()
                df = qs[name](spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                ts.append(round(time.time() - t0, 3))
                if r == reps - 1:
                    nonlocal_plan[0] = df._jdf.queryExecution().explainString(
                        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                            "formatted"
                        )
                    )

            nonlocal_plan = [None]
            collector.measure(f"{name}#rep{r}", act)
            plan_txt = nonlocal_plan[0] or plan_txt
            gc.collect()
        spark.sparkContext._jvm.System.gc()
        c = collector.counters.get(f"{name}#rep{reps-1}", {})
        rec = {
            "query": name,
            "reps": ts,
            "median": round(statistics.median(ts), 3),
            "shuffle_mb": round(c.get("shuffle_read_bytes", 0) / 1e6, 1),
            "spill_mb": round(
                (c.get("memory_spill_bytes", 0) + c.get("disk_spill_bytes", 0)) / 1e6,
                1,
            ),
        }
        out[name] = rec
        print(json.dumps(rec), flush=True)
        if plan_txt:
            with open(os.path.join(plans_dir, f"{name}_{suffix}.txt"), "w") as fh:
                fh.write(plan_txt)
    with open(os.path.join(here, f"/tmp/profile_{suffix}.json"), "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
