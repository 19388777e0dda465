"""Behavioral tests for extensions.matview (incremental rollup
maintenance): merge accumulation, replace idempotence, and partition
isolation — the properties the oracle-paired registry query can't pin
individually."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hdp_tez_spark.extensions.matview import apply_delta, read_rollup


def _delta(spark, rows):
    return spark.createDataFrame(rows, "day string, k string, v double")


def _state(spark, path):
    return {
        (r["day"], r["k"]): (r["cnt"], r["total"])
        for r in read_rollup(spark, path, derive_avg=False).collect()
    }


def test_merge_accumulates_across_deltas(spark, tmp_path):
    p = str(tmp_path / "s")
    apply_delta(spark, p, _delta(spark, [("d1", "a", 1.0), ("d1", "a", 2.0)]),
                "day", ["k"], "v", mode="merge")
    apply_delta(spark, p, _delta(spark, [("d1", "a", 4.0), ("d1", "b", 8.0)]),
                "day", ["k"], "v", mode="merge")
    assert _state(spark, p) == {("d1", "a"): (3, 7.0), ("d1", "b"): (1, 8.0)}


def test_replace_is_replay_idempotent(spark, tmp_path):
    p = str(tmp_path / "s")
    full_day = _delta(spark, [("d1", "a", 1.0), ("d1", "a", 2.0)])
    apply_delta(spark, p, full_day, "day", ["k"], "v", mode="replace")
    apply_delta(spark, p, full_day, "day", ["k"], "v", mode="replace")
    assert _state(spark, p) == {("d1", "a"): (2, 3.0)}


def test_merge_touches_only_affected_partitions(spark, tmp_path):
    p = str(tmp_path / "s")
    apply_delta(spark, p, _delta(spark, [("d1", "a", 1.0), ("d2", "a", 2.0)]),
                "day", ["k"], "v", mode="merge")
    # second delta only touches d2; d1 state must survive byte-identically
    apply_delta(spark, p, _delta(spark, [("d2", "a", 5.0)]),
                "day", ["k"], "v", mode="merge")
    assert _state(spark, p) == {("d1", "a"): (1, 1.0), ("d2", "a"): (2, 7.0)}


def test_replace_does_not_merge_existing_state(spark, tmp_path):
    p = str(tmp_path / "s")
    apply_delta(spark, p, _delta(spark, [("d1", "a", 1.0)]),
                "day", ["k"], "v", mode="merge")
    # corrected re-delivery: the day now holds different data
    apply_delta(spark, p, _delta(spark, [("d1", "a", 9.0)]),
                "day", ["k"], "v", mode="replace")
    assert _state(spark, p) == {("d1", "a"): (1, 9.0)}


def test_read_rollup_derives_avg(spark, tmp_path):
    p = str(tmp_path / "s")
    apply_delta(spark, p, _delta(spark, [("d1", "a", 2.0), ("d1", "a", 4.0)]),
                "day", ["k"], "v", mode="merge")
    row = read_rollup(spark, p).collect()[0]
    assert row["avg"] == pytest.approx(3.0)


def test_apply_delta_rejects_unknown_mode(spark, tmp_path):
    with pytest.raises(ValueError):
        apply_delta(spark, str(tmp_path / "s"), _delta(spark, [("d", "a", 1.0)]),
                    "day", ["k"], "v", mode="upsert")
