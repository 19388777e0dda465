"""Approximate-distinct surface: HLL++ error bounds and sketch mergeability
(the pre-aggregation pattern for 100 TB rollups)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hdp_tez_spark.operators import aggregates as agg
from hdp_tez_spark.sources.catalog import load_table
from tests.conftest import SF_SMOKE


def test_approx_distinct_within_rsd(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    approx = {
        r.l_returnflag: r.approx_distinct
        for r in agg.approx_distinct(li, ["l_returnflag"], "l_orderkey").collect()
    }
    exact = {
        r.l_returnflag: r.d
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("d"))
        .collect()
    }
    for k, e in exact.items():
        assert abs(approx[k] - e) / e < 0.15, (k, approx[k], e)


def test_hll_sketches_merge_to_global(spark):
    """Union of per-group sketches must estimate the global distinct the
    same as a single global sketch — the property that makes persisted
    sketch tables answer arbitrary rollups."""
    li = load_table(spark, SF_SMOKE, "lineitem")
    per_flag = agg.hll_sketches(li, ["l_returnflag"], "l_orderkey")
    rolled = agg.hll_rollup(per_flag.withColumn("g", F.lit(1)), ["g"])
    merged = rolled.first().approx_distinct
    direct = li.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("l_orderkey")).alias("d")
    ).first().d
    # union of sketches is not bit-identical to one-pass sketching (mode
    # transitions differ) — assert both land within HLL error of the truth
    exact = li.select("l_orderkey").distinct().count()
    assert abs(merged - direct) / exact < 0.02
    assert abs(merged - exact) / exact < 0.05
    assert abs(direct - exact) / exact < 0.05
