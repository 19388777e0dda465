"""Array / map / JSON function surface.

Absent from the reference — Tez has no expression language at all
(SURVEY §2.8: clients like Hive supply it). The engine exposes Spark's
collection and semi-structured functions as first-class surface, all
JVM-side / codegen'd. This module wraps the shapes a pipeline needs
(JSON property extraction, array building/aggregation, map construction)
so they're testable as engine operators.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def json_get(col: Column, path: str) -> Column:
    """Extract a JSON field as string (get_json_object passthrough)."""
    return F.get_json_object(col, path)


def json_parse(col: Column, schema: StructType | str) -> Column:
    """Parse a JSON string column into a typed struct (from_json)."""
    return F.from_json(col, schema)


def with_json_fields(df: DataFrame, json_col: str, fields: dict[str, str]) -> DataFrame:
    """Project JSON paths out of a string column: {out_name: '$.path'}."""
    out = df
    for name, path in fields.items():
        out = out.withColumn(name, F.get_json_object(F.col(json_col), path))
    return out


def array_stats(df: DataFrame, arr_col: str, id_col: str) -> DataFrame:
    """Per-row array statistics — the array-function surface in one op."""
    a = F.col(arr_col)
    dbl = F.transform(a, lambda x: x.cast("double"))
    return df.select(
        F.col(id_col),
        F.size(a).alias("n"),
        F.round(F.array_min(dbl), 6).alias("amin"),
        F.round(F.array_max(dbl), 6).alias("amax"),
        F.round(
            F.aggregate(dbl, F.lit(0.0), lambda acc, x: acc + x), 6
        ).alias("asum"),
        F.round(F.element_at(dbl, 1), 6).alias("first_el"),
        F.round(
            F.aggregate(F.slice(dbl, 1, 8), F.lit(0.0), lambda acc, x: acc + x), 6
        ).alias("head_sum"),
    )


def collect_sorted_list(
    df: DataFrame,
    keys: Sequence[str],
    sort_cols: Sequence[str],
    value_col: str,
    limit: int | None = None,
    out: str = "values",
) -> DataFrame:
    """Per-group ordered value list (grouping-comparator semantics made
    visible as data): sort_array over (sort_cols..., value) structs then
    project the value — deterministic independent of shuffle order."""
    struct_cols = [F.col(c) for c in sort_cols] + [F.col(value_col)]
    arr = F.array_sort(F.collect_list(F.struct(*struct_cols)))
    if limit is not None:
        arr = F.slice(arr, 1, limit)
    return df.groupBy(*keys).agg(
        F.transform(arr, lambda s: s[value_col]).alias(out)
    )
