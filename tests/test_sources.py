"""Source/sink surface: MRInput/MROutput parity (SURVEY §2.1).

Round-trips through parquet / csv / json / orc, partitioned writes, and
bucketed tables with a shuffle-free join — the Spark equivalents of
Tez's MRInput (`tez-mapreduce/.../input/MRInput.java:84`) over arbitrary
InputFormats and MROutput commit semantics.
"""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from hdp_tez_spark.sources.catalog import load_table, write_parquet
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def nation(spark):
    return load_table(spark, SF_SMOKE, "nation")


def _roundtrip(spark, df, fmt: str, **read_opts):
    d = tempfile.mkdtemp(prefix=f"sink_{fmt}_")
    df.write.mode("overwrite").format(fmt).save(d)
    back = spark.read.format(fmt).options(**read_opts).load(d)
    return back


def test_parquet_roundtrip(spark, nation):
    d = tempfile.mkdtemp(prefix="sink_parquet_")
    write_parquet(nation, d)
    back = spark.read.parquet(d)
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in nation.collect()}


def test_csv_roundtrip(spark, nation):
    d = tempfile.mkdtemp(prefix="sink_csv_")
    nation.write.mode("overwrite").option("header", True).csv(d)
    back = spark.read.option("header", True).option("inferSchema", True).csv(d)
    assert back.count() == nation.count()
    assert set(back.columns) == set(nation.columns)


def test_json_roundtrip(spark, nation):
    back = _roundtrip(spark, nation, "json")
    assert back.count() == nation.count()
    got = {(r.n_nationkey, r.n_name) for r in back.collect()}
    assert got == {(r.n_nationkey, r.n_name) for r in nation.collect()}


def test_orc_roundtrip(spark, nation):
    back = _roundtrip(spark, nation, "orc")
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in nation.collect()}


def test_json_helpers_explicit_schema(spark, nation):
    from hdp_tez_spark.sources.catalog import read_json, write_json

    d = tempfile.mkdtemp(prefix="sink_jsonh_") + "/t"
    write_json(nation.select("n_nationkey", "n_name"), d)
    back = read_json(spark, d, "n_nationkey long, n_name string")
    assert dict(back.dtypes) == {"n_nationkey": "bigint", "n_name": "string"}
    assert {(r.n_nationkey, r.n_name) for r in back.collect()} == {
        (r.n_nationkey, r.n_name) for r in nation.collect()
    }


def test_orc_helpers_pushdown(spark, nation):
    from hdp_tez_spark.sources.catalog import read_orc, write_orc

    d = tempfile.mkdtemp(prefix="sink_orch_") + "/t"
    write_orc(nation, d)
    q = read_orc(spark, d).where(F.col("n_regionkey") == 1).select("n_name")
    plan = q._jdf.queryExecution().executedPlan().toString()
    # the filter reaches the ORC reader (stripe min/max skipping) and the
    # scan reads only the projected + filtered columns
    assert "PushedFilters: [" in plan and "n_regionkey" in plan.split("PushedFilters:")[1][:120], plan
    assert q.count() == nation.where(F.col("n_regionkey") == 1).count()


def test_partitioned_write_prunes(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    d = tempfile.mkdtemp(prefix="sink_part_")
    write_parquet(
        li.select("l_orderkey", "l_returnflag", "l_quantity"),
        d,
        partition_by=["l_returnflag"],
    )
    back = spark.read.parquet(d).where(F.col("l_returnflag") == "R")
    plan = back._jdf.queryExecution().executedPlan().toString()
    # partition pruning: the scan reads only the matching directory
    assert back.count() == li.where(F.col("l_returnflag") == "R").count()
    assert "PartitionFilters: [isnotnull(l_returnflag" in plan or "l_returnflag#" in plan


def test_bucketed_join_has_no_shuffle(spark):
    """Pre-bucketed co-located join: both sides bucketed by the key ->
    SortMergeJoin with no Exchange (the Tez 'persisted partitioned edge'
    reuse pattern, and the 100 TB answer for repeated big-big joins)."""
    import shutil

    orders = load_table(spark, SF_SMOKE, "orders")
    li = load_table(spark, SF_SMOKE, "lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("b_orders", "b_lineitem"):
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    try:
        orders.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy(
            "o_orderkey"
        ).saveAsTable("b_orders")
        li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy(
            "l_orderkey"
        ).saveAsTable("b_lineitem")
        # MERGE hint: at this tiny SF Catalyst would otherwise broadcast
        # and bypass the bucketing entirely; on real data SMJ is the
        # default
        j = spark.table("b_lineitem").hint("MERGE").join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan
        assert "Bucketed: true" in plan, plan
        want = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
        assert j.count() == want
    finally:
        # leave the warehouse dir the size we found it
        for t in ("b_orders", "b_lineitem"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
            shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)


def test_text_roundtrip(spark, nation):
    """TextInputFormat parity (`MRInput.java:84` with TextInputFormat):
    line-oriented text in/out."""
    d = tempfile.mkdtemp(prefix="sink_text_")
    nation.select("n_name").write.mode("overwrite").text(d)
    back = spark.read.text(d)
    assert {r.value for r in back.collect()} == {
        r.n_name for r in nation.collect()
    }


def test_write_sorted_files_cover_disjoint_ranges(spark, tmp_path):
    """Range-sorted layout: each parquet file's min/max footer stats span
    a non-overlapping slice of the sort key, so engines can prune whole
    files on a range predicate."""
    import pyarrow.parquet as pq

    from hdp_tez_spark.sources.catalog import load_table, write_sorted

    li = load_table(spark, SF_SMOKE, "lineitem")
    out = str(tmp_path / "li_sorted")
    write_sorted(li, out, ["l_extendedprice"], partitions=8)

    back = spark.read.parquet(out)
    assert back.count() == li.count()

    ranges = []
    for f in os.listdir(out):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(out, f)).metadata
        idx = [md.schema.column(i).name for i in range(md.num_columns)].index(
            "l_extendedprice"
        )
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    assert len(ranges) > 1
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"file ranges overlap: ({lo1},{hi1}) vs ({lo2},{hi2})"


def test_insert_overwrite_partitions_replaces_only_written_partitions(spark, tmp_path):
    from hdp_tez_spark.sources.catalog import insert_overwrite_partitions

    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0), (4, "c", 40.0)],
        "id int, part string, v double",
    )
    df.write.partitionBy("part").parquet(path)
    # dynamic overwrite of partition 'a' only
    repl = spark.createDataFrame([(9, "a", 99.0)], "id int, part string, v double")
    insert_overwrite_partitions(repl, path, ["part"])
    back = {(r["id"], r["part"], r["v"]) for r in spark.read.parquet(path).collect()}
    assert back == {(9, "a", 99.0), (3, "b", 30.0), (4, "c", 40.0)}


def test_insert_overwrite_partitions_restores_session_conf(spark, tmp_path):
    from hdp_tez_spark.sources.catalog import insert_overwrite_partitions

    key = "spark.sql.sources.partitionOverwriteMode"
    spark.conf.set(key, "static")
    df = spark.createDataFrame([(1, "a", 1.0)], "id int, part string, v double")
    insert_overwrite_partitions(df, str(tmp_path / "t2"), ["part"])
    assert spark.conf.get(key) == "static"
    spark.conf.unset(key)


def test_event_time_queries_immune_to_foreign_session_timezone(spark):
    """The driver may hand the engine a session configured for any local
    timezone; catalog.load_table pins UTC internally so every event-time
    derivation (window buckets, epoch casts, day formatting) matches the
    DuckDB oracle's naive-timestamp semantics regardless. Probe from the
    verify recipe: flip the session to America/New_York, run event-time
    queries, compare to their oracles, restore."""
    import duckdb

    import __spark_entry__ as E
    from hdp_tez_spark.sources.catalog import TABLES

    key = "spark.sql.session.timeZone"
    prev = spark.conf.get(key)
    spark.conf.set(key, "America/New_York")
    try:
        con = duckdb.connect()
        for t in TABLES:
            con.sql(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF_SMOKE}/{t}.parquet')"
            )
        for name in ("tumbling_window", "range_frame_window", "windowed_topk"):
            got = E.queries()[name](spark, SF_SMOKE).toPandas()
            want = con.sql(E.oracle_sql()[name]).df()
            got = got.reindex(sorted(got.columns), axis=1).astype(str)
            want = want.reindex(sorted(want.columns), axis=1).astype(str)
            assert sorted(got.apply(tuple, axis=1)) == sorted(
                want.apply(tuple, axis=1)
            ), name
    finally:
        spark.conf.set(key, prev)
