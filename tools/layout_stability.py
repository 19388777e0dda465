"""Layout-stability audit for rounded float aggregates (BENCH_NOTES r07).

The bug class: a double SUM's result depends on summation order, so a
different partition layout can flip the last rounded decimal — tpch_q1's
money sums measured 0.00493 of layout noise against the 0.005 threshold
of round(x, 2) at sf1.0 (wrong-at-scale, invisible at sf0.01, fixed with
exact DECIMAL arithmetic). This tool is the cheap repro: run each query
TWICE under aggressively different physical layouts and demand the
driver's own canonical string forms are byte-identical.

Layout A: spark.sql.shuffle.partitions=32, files.maxPartitionBytes=128m
Layout B: spark.sql.shuffle.partitions=7,  files.maxPartitionBytes=4m

Both knobs are runtime confs read at plan/execution time, so one JVM
suffices; B's 4m scan splits and prime partition count reshuffle both the
scan-side and the post-shuffle summation order. A query whose rounded
output differs between the two layouts is nondeterministic run-to-run at
that scale — a defect for money columns regardless of which value the
oracle happens to match.

Usage:
    python tools/layout_stability.py [sf_dir] [query ...]
    # default sf_dir /root/testdata/sf0.1; default query set =
    # auto-discovered rounded-money-sum queries (--list to print)

The discovery is source-based: every registry query whose implementation
rounds a SUM over a money-ish column (price/cost/balance/revenue/charge)
is audited, so new money queries are picked up automatically. Run at
sf1.0 (tools/make_sf.py output) for the real guard — noise grows with
terms-per-group; sf0.01 runs exercise only the harness.
"""

from __future__ import annotations

import inspect
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod
from check_correctness import canonical, exact_compare

#: money-ish column fragments; SUMs over these get rounded to cents (or a
#: fixed dp) in the registry, which is where layout noise becomes a
#: user-visible wrong cent
_MONEY = re.compile(
    r"price|cost|bal\b|acctbal|revenue|charge|amount|total_price", re.I
)
_ROUNDED_SUM = re.compile(r"round\s*\(\s*(?:F\s*\.\s*)?sum", re.I)

# Layouts: prime partition count + tiny scan splits in B maximize the
# chance that partial-agg trees group different terms than A.
LAYOUT_A = {
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
}
LAYOUT_B = {
    "spark.sql.shuffle.partitions": "7",
    "spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024),
}


def money_sum_queries() -> list[str]:
    """Registry queries whose source rounds a SUM and touches a money-ish
    column — the population where a layout-flipped last decimal is a
    wrong cent."""
    names = []
    for name, fn in entry_mod.queries().items():
        try:
            src = inspect.getsource(fn)
        except (OSError, TypeError):  # pragma: no cover - builtins only
            continue
        if _ROUNDED_SUM.search(src) and _MONEY.search(src):
            names.append(name)
    return names


def run_under_layout(spark, fn, sf_dir: str, layout: dict):
    saved = {}
    for k, v in layout.items():
        saved[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    try:
        return fn(spark, sf_dir).toPandas()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def audit(spark, names: list[str], sf_dir: str) -> list[str]:
    """Return the list of layout-UNSTABLE query names (empty = green)."""
    qs = entry_mod.queries()
    unstable = []
    for name in names:
        t0 = time.time()
        a = canonical(run_under_layout(spark, qs[name], sf_dir, LAYOUT_A))
        b = canonical(run_under_layout(spark, qs[name], sf_dir, LAYOUT_B))
        problems = []
        if len(a) != len(b):
            problems = [f"rowcount {len(a)} vs {len(b)}"]
        else:
            problems = exact_compare(a, b)
        took = time.time() - t0
        if problems:
            unstable.append(name)
            print(f"UNSTABLE {name}: " + "; ".join(problems) + f" [{took:.1f}s]")
        else:
            print(f"stable   {name} rows={len(a)} [{took:.1f}s]")
    return unstable


def main() -> int:
    raw = sys.argv[1:]
    if "--list" in raw:
        print("\n".join(money_sum_queries()))
        return 0
    sf_dir = raw[0] if raw else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    names = raw[1:] or money_sum_queries()
    from hdp_tez_spark.session import get_session

    spark = get_session("layout-stability", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    unstable = audit(spark, names, sf_dir)
    print(f"\n{len(unstable)} unstable of {len(names)}")
    return 1 if unstable else 0


if __name__ == "__main__":
    raise SystemExit(main())
