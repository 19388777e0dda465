"""Counters / observability: TaskCounter parity via df.observe().

Reference parity: Tez exposes per-task counters
(`tez-api/.../common/counters/TaskCounter.java:28-202` — INPUT_RECORDS_PROCESSED,
OUTPUT_RECORDS :93, SPILLED_RECORDS :57, SHUFFLE_BYTES :154 ...) aggregated
per vertex/DAG. The Spark equivalents:

- record-level counters -> `df.observe(Observation, exprs...)`, computed
  inline with the plan (CollectMetricsExec — zero extra passes over the
  data) and pulled after the action completes;
- byte/spill/shuffle counters -> Spark's own task metrics (status store /
  SparkListener), which the engine does not re-implement.

Usage:
    reg = CounterRegistry()
    df = reg.observed(df, "load", input_records=F.count(F.lit(1)))
    df....collect()            # any action
    reg.get("load")["input_records"]
"""

from __future__ import annotations

import threading
from typing import Any

from pyspark.sql import Column, DataFrame, Observation


class CounterRegistry:
    """Collects named df.observe() metrics across actions."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._observations: dict[str, Observation] = {}

    def observed(self, df: DataFrame, name: str, **metrics: Column) -> DataFrame:
        """Attach named metric expressions to a DataFrame. They are computed
        by whichever action next executes the returned DataFrame."""
        if not metrics:
            raise ValueError("at least one metric expression is required")
        obs = Observation(name)
        out = df.observe(obs, *[m.alias(k) for k, m in metrics.items()])
        with self._lock:
            self._observations[name] = obs
        return out

    def get(self, name: str) -> dict[str, Any]:
        """Metric values for an observation; blocks until the action that
        executed the observed DataFrame has completed."""
        with self._lock:
            obs = self._observations.get(name)
        if obs is None:
            raise KeyError(f"no observation named {name!r}")
        return dict(obs.get)


# Mapping of the reference's TaskCounter names (TaskCounter.java:28-202) to
# engine-level equivalents, for documentation and dashboard parity.
TASK_COUNTER_MAP = {
    "INPUT_RECORDS_PROCESSED": "observe(count) on the source DataFrame",
    "OUTPUT_RECORDS": "observe(count) on the sink DataFrame",
    "SPILLED_RECORDS": "Spark task metrics: memoryBytesSpilled/diskBytesSpilled",
    "SHUFFLE_BYTES": "Spark task metrics: shuffleRead/WriteBytes",
    "COMBINE_INPUT_RECORDS": "partial-aggregation rows (Spark SQL metrics)",
    "REDUCE_INPUT_GROUPS": "post-shuffle groups (Spark SQL metrics)",
}
