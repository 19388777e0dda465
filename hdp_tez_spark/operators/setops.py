"""Set operators: union (VertexGroup), intersect, except, cogroup.

Reference parity map:

- UNION ALL: Tez `VertexGroup` + `ConcatenatedMergedKeyValueInput`
  concatenates multiple vertices' outputs with no order guarantee
  (`tez-api/.../dag/api/VertexGroup.java`;
  `runtime/library/input/ConcatenatedMergedKeyValueInput.java:39-90`).
  Spark `unionAll` is a zero-shuffle concatenation of partitions.
- UNION of grouped inputs (`ConcatenatedMergedKeyValuesInput.java:40`, used
  by `tez-tests/.../UnionExample.java:207-222`): union then groupBy.
- Multi-edge sorted merge (`OrderedGroupedMergedKVInput.java:48-234`, a
  k-way heap merge presenting several sorted edges as one grouped stream):
  the relational equivalent is cogroup — both sides co-partitioned and
  grouped in one pass.
- INTERSECT / EXCEPT: not Tez primitives (expressible as join patterns);
  Spark built-ins included for surface completeness.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame


def union_all(parts: Sequence[DataFrame], by_name: bool = True) -> DataFrame:
    """VertexGroup union of N inputs. `by_name` resolves columns by name
    (safer); positional otherwise, matching Tez's schema-less concatenation.
    """
    if not parts:
        raise ValueError("union_all needs at least one input")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p) if by_name else out.unionAll(p)
    return out


def union_grouped(parts: Sequence[DataFrame], keys: Sequence[str], aggs: Sequence[Column]) -> DataFrame:
    """UNION then GROUP BY — `UnionExample` / ConcatenatedMergedKeyValuesInput
    parity. Partial aggregation runs on each input branch before the single
    shuffle, so the union itself adds no data movement."""
    return union_all(parts).groupBy(*keys).agg(*aggs)


def intersect_rows(a: DataFrame, b: DataFrame, distinct: bool = True) -> DataFrame:
    return a.intersect(b) if distinct else a.intersectAll(b)


def except_rows(a: DataFrame, b: DataFrame, distinct: bool = True) -> DataFrame:
    return a.exceptAll(b) if not distinct else a.subtract(b)


def cogroup_apply(a, b, keys: Sequence[str], func, schema):
    """Cogroup two DataFrames on keys and apply a pandas function per
    co-grouped pair — `OrderedGroupedMergedKVInput` parity (one co-located
    pass over both sides' groups). Arrow-batched; each group must fit in
    one executor's memory, so keys must not be pathological hot keys.

    func: (pd.DataFrame, pd.DataFrame) -> pd.DataFrame
    """
    return (
        a.groupBy(*keys)
        .cogroup(b.groupBy(*keys))
        .applyInPandas(func, schema=schema)
    )
