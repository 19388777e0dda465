"""Layout operators: Z-order clustering quality, small-file compaction,
per-file stats, and partition-pruning verification."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from hdp_tez_spark.sources.catalog import load_table, write_parquet
from hdp_tez_spark.sources.layout import (
    compact_small_files,
    file_stats,
    zorder_by,
    zorder_value,
)
from tests.conftest import SF_SMOKE


def _py_morton(cells: list[int], bits: int) -> int:
    z = 0
    for i in range(bits):
        for j, c in enumerate(cells):
            z |= ((c >> i) & 1) << (i * len(cells) + j)
    return z


def test_zorder_value_matches_python_reference(spark):
    rows = [(x, y) for x in range(8) for y in range(8)]
    df = spark.createDataFrame(rows, "x int, y int")
    got = (
        df.withColumn(
            "z",
            zorder_value(
                [F.col("x"), F.col("y")],
                [F.lit(0), F.lit(0)],
                [F.lit(8), F.lit(8)],
                bits=3,
            ),
        )
        .collect()
    )
    for r in got:
        # span 8 over 2^3 cells -> cell == value (clamped to 7)
        cx, cy = min(r["x"], 7), min(r["y"], 7)
        assert r["z"] == _py_morton([cx, cy], 3), (r["x"], r["y"])


def test_zorder_bits_overflow_rejected(spark):
    df = spark.createDataFrame([(1, 1)], "x int, y int")
    with pytest.raises(ValueError):
        zorder_value([F.col("x")] * 4, [F.lit(0)] * 4, [F.lit(1)] * 4, bits=16)


def test_zorder_layout_prunes_both_columns(spark, tmp_path):
    """Z-ordered files must have small per-file min/max spans on BOTH
    cluster keys; a hash-partitioned write has near-global spans."""
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    zpath = str(tmp_path / "z")
    rpath = str(tmp_path / "r")
    zorder_by(li, ["l_orderkey", "l_partkey"], partitions=16).drop("__z").write.parquet(zpath)
    li.repartition(16).write.parquet(rpath)

    def avg_span(path: str, col: str) -> float:
        rows = file_stats(spark, path, [col]).collect()
        return sum(r[f"max_{col}"] - r[f"min_{col}"] for r in rows) / len(rows)

    glob_ok = li.agg(F.max("l_orderkey") - F.min("l_orderkey")).first()[0]
    glob_pk = li.agg(F.max("l_partkey") - F.min("l_partkey")).first()[0]
    # both dimensions must shrink vs the hash layout's ~global span
    assert avg_span(zpath, "l_orderkey") < 0.5 * glob_ok
    assert avg_span(zpath, "l_partkey") < 0.5 * glob_pk
    assert avg_span(rpath, "l_orderkey") > 0.9 * glob_ok
    # and the data survives intact
    assert spark.read.parquet(zpath).count() == li.count()


def test_compact_small_files_reduces_count_preserves_data(spark, tmp_path):
    li = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_quantity")
    path = str(tmp_path / "frag")
    li.repartition(32).write.parquet(path)
    n_before = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    total_before = spark.read.parquet(path).count()
    sum_before = spark.read.parquet(path).agg(F.sum("l_quantity")).first()[0]

    n = compact_small_files(spark, path, target_bytes=1 << 30)
    assert n == 1
    n_after = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    assert n_after < n_before
    assert spark.read.parquet(path).count() == total_before
    assert spark.read.parquet(path).agg(F.sum("l_quantity")).first()[0] == pytest.approx(
        sum_before
    )
    # staging/trash dirs cleaned up
    assert not os.path.exists(path + "__compacting")
    assert not os.path.exists(path + "__old")


def test_partition_pruning_reaches_scan(spark, tmp_path):
    """A filter on a partitionBy column must become a PartitionFilter
    (pruned at planning), not a post-scan Filter."""
    orders = load_table(spark, SF_SMOKE, "orders")
    path = str(tmp_path / "by_status")
    write_parquet(orders, path, partition_by=["o_orderstatus"])
    plan = (
        spark.read.parquet(path)
        .where(F.col("o_orderstatus") == "F")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [isnotnull(o_orderstatus" in plan, plan
    # row counts agree with the unpartitioned source
    got = spark.read.parquet(path).where(F.col("o_orderstatus") == "F").count()
    want = orders.where(F.col("o_orderstatus") == "F").count()
    assert got == want
