"""User-defined aggregate surface (SURVEY §2.10).

Reference parity: Tez exposes UDAF-like behavior only through the
`Combiner` interface (`runtime/library/common/combine/Combiner.java:39-41`)
plus reduce-side user loops (`tez-examples/.../WordCount.java:113-140`) —
arbitrary Java over grouped values. The Spark-native equivalents, fastest
first:

1. built-in `pyspark.sql.functions` aggregates (JVM, codegen) — always
   prefer these;
2. `@pandas_udf` GROUPED_AGG (Arrow batches, one pandas Series per group)
   — for aggregates Spark lacks;
3. `applyInPandas` grouped-map — when the result is per-group *rows*
   rather than a scalar.

Scale note: a GROUPED_AGG pandas UDF disables partial aggregation — every
raw row shuffles to its group's reducer (exactly Tez's no-combiner path).
Keep such UDAFs off the hottest keys, or pre-reduce with a built-in first.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def median_udaf(v: pd.Series) -> float:
    """Exact median (linear interpolation at even counts — same convention
    as ANSI percentile_cont(0.5)). Arrow-batched GROUPED_AGG pandas UDF."""
    return float(v.median())


def group_median(
    df: DataFrame, keys: list[str], value_col: str, out: str = "median"
) -> DataFrame:
    """Per-group exact median via the pandas UDAF."""
    return df.groupBy(*keys).agg(median_udaf(F.col(value_col)).alias(out))


def percentile_exact(col: Column | str, p: float) -> Column:
    """Exact percentile with linear interpolation — built-in JVM `percentile`
    (= ANSI percentile_cont); use instead of a UDAF whenever possible."""
    return F.percentile(F.col(col) if isinstance(col, str) else col, F.lit(p))
