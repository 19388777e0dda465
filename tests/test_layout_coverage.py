"""Layout-stability audit coverage gate (VERDICT r08 task #3).

The audit population is schema-derived — any registry query with a
float/double anywhere in its output schema is in scope. This test
re-derives that discovery against the live registry and fails when a
float-emitting query is missing from the committed
LAYOUT_STABILITY.json, i.e. when a query was added without re-running
`tools/layout_stability.py`. It is the executable form of the r07
tpch_q1 lesson (a double SUM's last rounded decimal can flip with
partition layout): the audit itself runs per round at scale; CI only
guarantees nobody can fall out of its population silently.
"""

from __future__ import annotations

import json
import os

from tests.conftest import SF_SMOKE
from tools.layout_stability import float_output_queries

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_committed_layout_audit_covers_all_float_queries(spark):
    with open(os.path.join(_REPO, "LAYOUT_STABILITY.json")) as fh:
        record = json.load(fh)
    audited = set(record["audited"])
    current = set(float_output_queries(spark, SF_SMOKE))
    missing = sorted(current - audited)
    assert not missing, (
        "float-output queries missing from the committed layout audit — "
        f"re-run tools/layout_stability.py and commit: {missing}"
    )
    assert record["unstable"] == [], record["unstable"]
