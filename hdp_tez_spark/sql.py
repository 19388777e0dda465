"""SQL passthrough surface (SURVEY §7 architecture: `sql.py`).

Tez has no SQL or expression layer — Hive-on-Tez supplies it
(`docs/src/site/markdown/index.md:33`, SURVEY §2.8). In this engine the
parser/optimizer IS Catalyst: `spark.sql` over the registered tables is a
first-class entry point with exactly the same physical behavior as the
DataFrame operator library (both compile to the same plans).

Scale note: SQL text goes through identical pushdown/pruning/AQE as the
DataFrame API; there is no penalty either way. Views registered here are
metadata-only (no materialization).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from hdp_tez_spark.sources.catalog import TABLES, load_table


def register_tables(
    spark: SparkSession, sf_dir: str, tables: Sequence[str] = TABLES
) -> None:
    """Register the catalog tables as temp views for SQL access."""
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def sql(spark: SparkSession, query: str) -> DataFrame:
    """Run a SQL query against the registered views."""
    return spark.sql(query)
