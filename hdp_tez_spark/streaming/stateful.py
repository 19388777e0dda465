"""Custom stateful streaming operators via `applyInPandasWithState`.

Beyond-reference extension (SURVEY §2.9): the reference has no streaming at
all (`tez-api/.../dag/api/EdgeProperty.java:71-102` marks EPHEMERAL /
CONCURRENT edges "not supported yet"). The closest Tez concept is an
arbitrary stateful Processor (`tez-api/.../runtime/api/
AbstractLogicalIOProcessor.java`) holding state across records of one task;
here the state store holds per-key state across *micro-batches*, fault
tolerant via checkpointing.

Scale notes: state lives partitioned by key in the state store (RocksDB
backend in production: `spark.sql.streaming.stateStore.providerClass`).
Each micro-batch shuffles only that batch's rows to their key's partition —
state never moves. Unbounded key cardinality needs a timeout policy
(GroupStateTimeout) so idle keys are evicted; otherwise state grows without
bound — the streaming analogue of the watermark rule for windows.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_totals(
    sdf: DataFrame,
    keys: Sequence[str],
    value_col: str,
    key_types: str,
    timeout: str = "NoTimeout",
) -> DataFrame:
    """Per-key running (count, total) maintained across micro-batches.

    Emits one row per key per micro-batch in which the key appeared, with
    the state *after* that batch — the streaming twin of
    `groupBy(keys).agg(count, sum)`, except the aggregate is available
    continuously instead of only at the end.

    `key_types` is the DDL for the key columns (e.g. "user_id long"),
    since the state/output schemas can't be inferred from a pandas func.
    """
    out_schema = f"{key_types}, cnt long, total double"
    state_schema = "cnt long, total double"

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            cnt, total = state.get
        else:
            cnt, total = 0, 0.0
        for pdf in pdfs:
            cnt += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((cnt, total))
        yield pd.DataFrame(
            [[*key, cnt, total]], columns=[*keys, "cnt", "total"]
        )

    return sdf.groupBy(*keys).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=getattr(GroupStateTimeout, timeout),
    )


def sessionize(
    sdf: DataFrame,
    key: str,
    ts_col: str,
    gap_seconds: int,
    key_type: str,
) -> DataFrame:
    """Event-time sessionizer: emits a row per *closed* session
    (session_start, session_end, n_events). A session closes when a later
    event for the same key arrives more than `gap_seconds` after the
    session's last event; the still-open session stays in state.

    This is the hand-rolled equivalent of `F.session_window` for cases
    needing custom close logic (e.g. emit intermediate stats, cap session
    length) — exactly the "custom stateful operator" slot
    `applyInPandasWithState` exists for. Late rows older than the open
    session's start are folded into the open session rather than reordered
    (single-pass semantics; pair with a watermark to bound disorder).
    """
    out_schema = (
        f"{key} {key_type}, session_start timestamp, "
        "session_end timestamp, n_events long"
    )
    state_schema = "start_us long, last_us long, n long"
    US = 1_000_000

    def update(
        key_val: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        rows = []
        ts_list: list[int] = []
        for pdf in pdfs:
            ts_list.extend(
                int(v.value) // 1000 for v in pd.to_datetime(pdf[ts_col])
            )
        ts_list.sort()
        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us, last_us, n = None, None, 0
        for t in ts_list:
            if start_us is None:
                start_us, last_us, n = t, t, 1
            elif t - last_us > gap_seconds * US:
                rows.append([*key_val,
                             pd.Timestamp(start_us, unit="us"),
                             pd.Timestamp(last_us, unit="us"), n])
                start_us, last_us, n = t, t, 1
            else:
                last_us, n = max(last_us, t), n + 1
        state.update((start_us, last_us, n))
        cols = [key, "session_start", "session_end", "n_events"]
        yield pd.DataFrame(rows, columns=cols)

    return sdf.groupBy(key).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
