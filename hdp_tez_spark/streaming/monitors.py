"""Streaming decision monitors: always-valid sequential tests applied
to a live stream's running aggregates.

The batch twins live in `extensions/experiments.py`; these wrappers
compose the SAME closed-form decision columns (shared helper —
`experiments.sprt_columns`) onto Structured Streaming aggregates, so a
ship/abort monitor emits a fresh decision row per micro-batch with the
statistical guarantee intact (Wald's boundaries are valid at EVERY
interim look — that is the point of running SPRT on a stream instead
of re-running a fixed-horizon t-test per batch, which inflates alpha
under peeking).

Reference contrast: Tez has no streaming surface at all (SURVEY §2.9);
this is Spark-native Structured Streaming composed with the engine's
experiment-stats layer.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hdp_tez_spark.extensions.experiments import sprt_columns


def sprt_monitor(
    sdf: DataFrame,
    group_cols: Sequence[str],
    success_col: str,
    p0: float,
    p1: float,
    alpha: float = 0.05,
    beta: float = 0.2,
) -> DataFrame:
    """Wald SPRT over a stream: cumulative (n, successes) per group as
    an unwindowed streaming aggregate (update mode — state is two
    longs per group, no watermark needed because the test is over ALL
    data so far), with the LLR / boundary / decision columns projected
    onto every emitted update. Drained with availableNow, the final
    row per group equals the batch `sprt_check` readout exactly —
    the oracle-parity contract every streaming operator here follows.

    Scale shape: streaming state is |groups| x 2 longs; each
    micro-batch shuffles its partial (count, sum) rows into the state
    store and the decision math is a stateless projection.
    """
    if not (0.0 < p0 < 1.0 and 0.0 < p1 < 1.0) or p0 == p1:
        raise ValueError("need 0 < p0, p1 < 1 and p0 != p1")
    if not (0.0 < alpha < 1.0 and 0.0 < beta < 1.0):
        raise ValueError("need 0 < alpha, beta < 1")
    s = F.col(success_col).cast("int")
    agg = (
        sdf.where(s.isNotNull())
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(s).alias("successes"),
        )
    )
    return sprt_columns(agg, p0, p1, alpha, beta)
