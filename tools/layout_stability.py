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
    # every registry query with a float/double anywhere in its OUTPUT
    # SCHEMA (--list to print; --money for the old source-regex set)

Discovery is schema-based (VERDICT r08 task #3): any query whose result
schema contains a float or double — top-level, nested in arrays, maps
or structs — is in the audited population, so a new float-emitting
query cannot silently skip the audit. The committed results file
(LAYOUT_STABILITY.json, plus a per-round LAYOUT_STABILITY_rNN.json
copy) records the audited set; tests/test_layout_coverage.py re-derives
the discovery and fails if a float-output registry query is absent from
the committed audit. The older source-regex money-sum discovery remains
as `--money` (a strict subset). Run at sf1.0 (tools/make_sf.py output)
for the real guard — noise grows with terms-per-group; sf0.01 runs
exercise only the harness.
"""

from __future__ import annotations

import inspect
import json
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


def _has_float(dt) -> bool:
    """True if a float/double hides anywhere in the type — top level,
    array elements, map keys/values, struct fields. DECIMAL is exact by
    construction and deliberately excluded."""
    from pyspark.sql import types as T

    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return True
    if isinstance(dt, T.ArrayType):
        return _has_float(dt.elementType)
    if isinstance(dt, T.MapType):
        return _has_float(dt.keyType) or _has_float(dt.valueType)
    if isinstance(dt, T.StructType):
        return any(_has_float(f.dataType) for f in dt.fields)
    return False


def float_output_queries(spark, sf_dir: str) -> list[str]:
    """Every registry query whose OUTPUT SCHEMA contains a float or
    double — the full population where a layout-flipped last rounded
    decimal is user-visible. Schema-only (analysis, no execution), so
    the discovery is cheap enough to re-run in CI."""
    names = []
    for name, fn in entry_mod.queries().items():
        try:
            schema = fn(spark, sf_dir).schema
        except Exception as exc:  # surfaces in plan_lint / sweeps, not here
            print(f"  (skip {name}: analysis failed: {exc!r:.120})",
                  file=sys.stderr)
            continue
        if any(_has_float(f.dataType) for f in schema.fields):
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


def audit(spark, names: list[str], sf_dir: str) -> dict[str, dict]:
    """Run each query under both layouts; per-query result record."""
    qs = entry_mod.queries()
    results: dict[str, dict] = {}
    for name in names:
        t0 = time.time()
        try:
            a = canonical(run_under_layout(spark, qs[name], sf_dir, LAYOUT_A))
            b = canonical(run_under_layout(spark, qs[name], sf_dir, LAYOUT_B))
            if len(a) != len(b):
                problems = [f"rowcount {len(a)} vs {len(b)}"]
            else:
                problems = exact_compare(a, b)
            rows = len(a)
        except Exception as exc:
            problems, rows = [f"error: {exc!r:.200}"], -1
        took = round(time.time() - t0, 1)
        results[name] = {
            "stable": not problems,
            "rows": rows,
            "wall_s": took,
            "problems": problems[:5],
        }
        tag = "stable  " if not problems else "UNSTABLE"
        detail = "" if not problems else ": " + "; ".join(problems[:3])
        print(f"{tag} {name} rows={rows}{detail} [{took}s]", flush=True)
    return results


def main() -> int:
    raw = sys.argv[1:]
    flags = {a for a in raw if a.startswith("--")}
    args = [a for a in raw if not a.startswith("--")]
    sf_dir = args[0] if args else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    from hdp_tez_spark.session import get_session

    spark = get_session("layout-stability", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    if "--money" in flags:
        names = args[1:] or money_sum_queries()
    else:
        names = args[1:] or float_output_queries(spark, sf_dir)
    if "--list" in flags:
        print("\n".join(names))
        return 0
    results = audit(spark, names, sf_dir)
    unstable = sorted(n for n, r in results.items() if not r["stable"])
    record = {
        "sf_dir": sf_dir,
        "discovery": "schema-float" if "--money" not in flags else "money-regex",
        "audited": sorted(names),
        "unstable": unstable,
        "results": results,
    }
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "LAYOUT_STABILITY.json")
    with open(out, "w") as fh:
        json.dump(record, fh, indent=1, sort_keys=True)
    print(f"\n{len(unstable)} unstable of {len(names)} -> {out}")
    return 1 if unstable else 0


if __name__ == "__main__":
    raise SystemExit(main())
