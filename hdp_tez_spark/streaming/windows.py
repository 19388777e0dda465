"""Time-window operators: tumbling / sliding / session windows, watermarked
streaming aggregation, and streaming dedup.

Beyond-reference extension: streaming is explicitly unsupported in the
reference (`tez-api/.../dag/api/EdgeProperty.java:71-102` —
`DataSourceType.EPHEMERAL` and `SchedulingType.CONCURRENT` are @Unstable
"not supported yet"; SURVEY §2.9). The engine exposes the idiomatic
Structured Streaming surface instead, with batch twins of each window
shape so results are oracle-checkable.

Each operator has two forms:
- a *batch* form over a static DataFrame (deterministic, SQL-oracled);
- a *streaming* form taking a streaming DataFrame and adding the
  watermark — same logical aggregation, incremental state store
  execution. The batch/stream parity is exactly Spark's unified-model
  guarantee, tested in tests/test_streaming.py with availableNow.

Scale notes: windowed aggregations shuffle by (window, keys) — state is
bounded by watermark eviction; session windows merge in the state store
per key. Skewed keys (one hot user) are the classic hazard — sub-key
salting before a second-stage merge is the mitigation if a key's session
state outgrows an executor.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _flatten_window(df: DataFrame, start_name: str, end_name: str) -> DataFrame:
    """Replace the struct `w` produced by window()/session_window() grouping
    with two plain timestamp columns."""
    return (
        df.withColumn(start_name, F.col("w.start"))
        .withColumn(end_name, F.col("w.end"))
        .drop("w")
    )


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
) -> DataFrame:
    """Fixed non-overlapping windows: one row per (window, keys).

    Output includes window_start / window_end as plain timestamp columns.
    """
    w = F.window(F.col(ts_col), duration)
    return _flatten_window(
        df.groupBy(w.alias("w"), *keys).agg(*aggs), "window_start", "window_end"
    )


def sliding_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
) -> DataFrame:
    """Overlapping windows: each event lands in duration/slide windows."""
    w = F.window(F.col(ts_col), duration, slide)
    return _flatten_window(
        df.groupBy(w.alias("w"), *keys).agg(*aggs), "window_start", "window_end"
    )


def session_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
) -> DataFrame:
    """Session windows: a session closes after `gap` of inactivity per key;
    session end = last event + gap (Spark session_window semantics)."""
    w = F.session_window(F.col(ts_col), gap)
    return _flatten_window(
        df.groupBy(w.alias("w"), *keys).agg(*aggs), "session_start", "session_end"
    )


def first_event_dedup(
    df: DataFrame, keys: Sequence[str], ts_col: str, tiebreak: Sequence[str]
) -> DataFrame:
    """Batch twin of streaming dropDuplicates: keep the first event per key
    by (ts, *tiebreak). Deterministic under timestamp ties."""
    from pyspark.sql import Window

    order = [F.col(ts_col), *[F.col(c) for c in tiebreak]]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


# ---------------------------------------------------------------------------
# Streaming forms
# ---------------------------------------------------------------------------


def stream_tumbling_agg(
    sdf: DataFrame,
    ts_col: str,
    duration: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming tumbling aggregation with late-data watermark. State for a
    window is dropped once the watermark passes window_end."""
    return tumbling_agg(
        sdf.withWatermark(ts_col, watermark), ts_col, duration, keys, aggs
    )


def stream_sliding_agg(
    sdf: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming sliding windows: each event lands in duration/slide
    overlapping windows; state per open window, evicted at the
    watermark. Overlap multiplies state cards by duration/slide — size
    the watermark accordingly."""
    return sliding_agg(
        sdf.withWatermark(ts_col, watermark), ts_col, duration, slide, keys, aggs
    )


def stream_static_enrich(
    sdf: DataFrame,
    dim: DataFrame,
    on,
    how: str = "inner",
) -> DataFrame:
    """Stream-static dimension enrichment: join a stream against a
    batch/dimension DataFrame. The static side is re-planned per
    micro-batch (so a dim refreshed between batches is picked up) and
    needs NO state store — unlike a stream-stream join there is nothing
    to watermark or evict, which makes this the cheapest join in
    Structured Streaming and the standard shape for attaching dimension
    attributes to an event stream before a windowed aggregation.

    The dim is broadcast-hinted: at any scale worth running a stream,
    the dimension is the small side, and broadcasting avoids shuffling
    the unbounded stream side per micro-batch. Outer joins where the
    STREAM side is preserved are supported by Spark; dim-preserving
    outer joins are not (no watermark on the static side) — Spark
    raises on those, and so does this helper's passthrough.
    """
    return sdf.join(F.broadcast(dim), on, how)


def stream_session_agg(
    sdf: DataFrame,
    ts_col: str,
    gap: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming session windows (state-store session merge per key)."""
    return session_agg(
        sdf.withWatermark(ts_col, watermark), ts_col, gap, keys, aggs
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    max_lag: str,
    how: str = "inner",
) -> DataFrame:
    """Equi-key join where the right event must fall within
    [left_ts - max_lag, left_ts] — e.g. "purchase attributed to a click in
    the last 10 minutes". Works identically on batch and streaming inputs
    (the unified-model guarantee).

    Streaming form: apply `withWatermark` to BOTH inputs before calling;
    the time bound lets Spark evict join state once the watermark passes
    (unbounded state otherwise — the stream-stream join hazard at scale).

    `how="left_outer"` keeps unmatched left events with NULL right
    columns. On a stream, an unmatched left row is emitted only once the
    watermark proves no future match can arrive — correct-by-eviction,
    which means outer results trail the watermark by design; a bounded
    drain (availableNow) emits them in the final no-data batch provided
    the watermark has advanced past the row's match horizon.
    """
    cond = None
    for k in keys:
        c = left[k] == right[k]
        cond = c if cond is None else cond & c
    lo = F.col(left_ts) - F.expr(f"INTERVAL {max_lag}")
    cond = cond & (F.col(right_ts) >= lo) & (F.col(right_ts) <= F.col(left_ts))
    return left.join(right, cond, how)


def stream_dedup(
    sdf: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    watermark: str = "1 hour",
    within_watermark: bool = False,
) -> DataFrame:
    """Streaming dedup on keys. With `within_watermark`, duplicates are only
    suppressed inside the watermark horizon (bounded state — the 100 TB
    shape); otherwise state grows with distinct keys."""
    wdf = sdf.withWatermark(ts_col, watermark)
    if within_watermark:
        return wdf.dropDuplicatesWithinWatermark(list(keys))
    return wdf.dropDuplicates([*keys])
