"""Layout-stability guard (BENCH_NOTES r07 money-sum audit, VERDICT r07
task #3): every rounded money aggregate must produce byte-identical
canonical strings under two aggressively different physical layouts
(shuffle.partitions 32 vs 7, maxPartitionBytes 128m vs 4m). This is the
cheap repro for the float-summation-order bug class that made tpch_q1's
cents nondeterministic at sf1.0 — a query that flips its last rounded
decimal with partition layout is wrong-at-scale even while it matches
the oracle at toy scale by luck.

CI runs a 6-query core at sf0.001 (harness + the known-risky queries,
seconds); the full auto-discovered money set runs via
`python tools/layout_stability.py [sf_dir]` — at sf1.0 for the real
noise-margin guard (per-round protocol, BASELINE.md §C).
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from layout_stability import audit, money_sum_queries  # noqa: E402

SF = "/root/testdata/sf0.001"

#: the queries whose group-sum magnitude (coarse groups over money
#: columns) puts them nearest the rounding threshold — tpch_q1 is the
#: r07 incident query, the rest are its highest-magnitude siblings
CORE = ["tpch_q1", "tpch_q3", "tpch_q6", "cube", "dag_pipeline", "mrr_group_order"]


def test_discovery_finds_the_money_set():
    names = money_sum_queries()
    # the r07 manual audit listed 19; source discovery nets a superset —
    # pin the members that must never silently drop out of the guard
    for q in CORE + ["tpch_q5", "tpch_q7", "broadcast_hash_join"]:
        assert q in names, f"{q} fell out of the money-sum discovery"
    assert len(names) >= 19


@pytest.mark.parametrize("name", CORE)
def test_money_sums_layout_stable(spark, name):
    res = audit(spark, [name], SF)[name]
    assert res["stable"], res["problems"]
