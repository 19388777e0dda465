"""CounterRegistry: TaskCounter-parity metrics via df.observe()."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hdp_tez_spark.metrics import CounterRegistry
from hdp_tez_spark.sources.catalog import load_table
from tests.conftest import SF_SMOKE


def test_observed_counters(spark):
    reg = CounterRegistry()
    li = load_table(spark, SF_SMOKE, "lineitem")
    observed = reg.observed(
        li,
        "scan",
        input_records=F.count(F.lit(1)),
        total_qty=F.round(F.sum("l_quantity"), 2),
    )
    out = observed.groupBy("l_returnflag").count()
    out.collect()
    got = reg.get("scan")
    assert got["input_records"] == li.count()
    assert got["total_qty"] > 0


def test_unknown_counter(spark):
    reg = CounterRegistry()
    with pytest.raises(KeyError):
        reg.get("nope")


def test_requires_metrics(spark):
    reg = CounterRegistry()
    li = load_table(spark, SF_SMOKE, "lineitem")
    with pytest.raises(ValueError):
        reg.observed(li, "empty")
