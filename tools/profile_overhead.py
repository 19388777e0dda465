"""Fixed-overhead decomposition for long-tail queries (VERDICT r10 #5).

The ~190-query bench tail averages ~1.1s at sf0.1 with near-zero
executor time — the cost is per-query FIXED overhead, not compute.
This tool splits each query's steady-state wall into:

- construct_s: the q_(spark, sf_dir) call — py4j plan construction +
  Catalyst ANALYSIS (analysis is eager on DataFrame creation) + any
  eager-at-construction jobs (checkpoint cuts, scalar reads);
- plan_s: queryExecution().executedPlan() — optimization + physical
  planning (pre-AQE);
- action_s: the noop-sink write — includes AQE re-planning round-trips,
  codegen compilation, job scheduling, and the actual tasks;
- exec_ms: executor task time from the status store (the part that is
  real distributed work);
- jobs/stages: how many scheduling round-trips the action cost.

Reps default to 3; rep0 is reported separately (first-execution codegen
cost), the median of the remaining reps is the steady state.

Usage:
    python tools/profile_overhead.py [--reps 4] q1 q2 ...
"""

from __future__ import annotations

import gc
import json
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
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        args = args[:i] + args[i + 2 :]
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))

    spark = get_session("hdp-tez-overhead", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    warm_up(spark)
    qs = entry_mod.queries()
    collector = TaskMetricsCollector(spark)
    sc = spark.sparkContext

    for name in names:
        if name not in qs:
            print(json.dumps({"query": name, "error": "not in registry"}))
            continue
        rows = []
        for r in range(reps):
            sc.setJobDescription(f"overhead:{name}:rep{r}")
            jobs0 = sc._jsc.sc().statusStore().jobsList(None).size()
            rec: dict[str, float] = {}

            def act() -> None:
                t0 = time.time()
                df = qs[name](spark, sf_dir)
                t1 = time.time()
                df._jdf.queryExecution().executedPlan()
                t2 = time.time()
                df.write.format("noop").mode("overwrite").save()
                t3 = time.time()
                rec.update(
                    construct_s=round(t1 - t0, 3),
                    plan_s=round(t2 - t1, 3),
                    action_s=round(t3 - t2, 3),
                    wall_s=round(t3 - t0, 3),
                )

            collector.measure(f"{name}#r{r}", act)
            c = collector.counters[f"{name}#r{r}"]
            rec["exec_ms"] = c["executor_run_ms"]
            rec["tasks"] = c["tasks_completed"]
            rec["jobs"] = (
                sc._jsc.sc().statusStore().jobsList(None).size() - jobs0
            )
            rows.append(rec)
            gc.collect()
        steady = rows[1:] or rows
        med = lambda k: round(  # noqa: E731
            statistics.median(x[k] for x in steady), 3
        )
        print(
            json.dumps(
                {
                    "query": name,
                    "first_wall_s": rows[0]["wall_s"],
                    "construct_s": med("construct_s"),
                    "plan_s": med("plan_s"),
                    "action_s": med("action_s"),
                    "wall_s": med("wall_s"),
                    "exec_ms": med("exec_ms"),
                    "tasks": med("tasks"),
                    "jobs": med("jobs"),
                }
            )
        )
        sys.stdout.flush()


if __name__ == "__main__":
    main()
