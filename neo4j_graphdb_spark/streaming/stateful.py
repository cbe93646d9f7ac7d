"""Custom stateful streaming operators via ``applyInPandasWithState``
(tier C extension — the escape hatch for semantics Structured Streaming's
built-in windows/dedup can't express).

The state store holds one Arrow-serializable row per key; the operator
function sees micro-batch slices per key plus that state — the canonical
pattern for running aggregates, sessionization with custom emit rules, or
cross-batch enrichment. Watermark + timeout bound state size at scale.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_SCHEMA = "key bigint, total_events bigint, total_value double"
_STATE_SCHEMA = "cnt bigint, val double"


def running_totals(
    stream: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    ts_col: str = "ts",
    watermark: str = "1 day",
) -> DataFrame:
    """Per-key running event count + value sum maintained across
    micro-batches in the state store; emits the updated running totals
    for every key seen in the current batch.

    This is the stateful operator the reference's counter printouts
    (``/root/reference/src/crwling.py:61-64``) hint at, generalized to a
    keyed stream: cumulative state that outlives any single batch.
    """

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        cnt, val = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            cnt += len(pdf)
            val += float(pdf[value_col].sum())
        state.update((cnt, val))
        yield pd.DataFrame(
            {"key": [key[0]], "total_events": [cnt], "total_value": [val]}
        )

    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=RUNNING_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


SESSION_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, n_events bigint"
)
_SESSION_STATE = "start_ns bigint, end_ns bigint, cnt bigint"


def stateful_sessions(
    stream: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    watermark: str = "90 days",
) -> DataFrame:
    """Streaming sessionization with CUSTOM emit rules — the operator
    ``session_window`` can't express: a session emits exactly once,
    when it CLOSES (a later event breaks the gap, or the event-time
    timeout fires after the watermark passes end+gap). Built-in session
    windows re-emit updated aggregates per batch; dashboards that want
    one row per finished session need this state-store shape instead.

    Per key the state holds the single open session (start, end,
    count) — O(keys) state, bounded by the watermark timeout at scale.
    Each batch folds its (sorted) events into the open session,
    yielding every session it closes; the still-open tail goes back to
    the store with an event-time timeout at ``end + gap``, so silence
    also closes a session (the case batch gaps-and-islands handles for
    free but a stream must discover via timeout).
    """
    gap_ns = gap_seconds * 1_000_000_000

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        def emit(rows: list[tuple[int, int, int]]) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "user_id": [key[0]] * len(rows),
                    "session_start": pd.to_datetime([r[0] for r in rows]),
                    "session_end": pd.to_datetime([r[1] for r in rows]),
                    "n_events": [r[2] for r in rows],
                }
            )

        if state.hasTimedOut:
            start, end, cnt = state.get
            state.remove()
            yield emit([(start, end, cnt)])
            return
        ts: list[int] = []
        for pdf in pdfs:
            ts.extend(int(v) for v in pdf[ts_col].astype("int64"))
        ts.sort()
        start, end, cnt = state.get if state.exists else (None, None, 0)
        closed: list[tuple[int, int, int]] = []
        for t in ts:
            if start is None:
                start, end, cnt = t, t, 1
            elif t - end <= gap_ns:
                end, cnt = t, cnt + 1
            else:
                closed.append((start, end, cnt))
                start, end, cnt = t, t, 1
        if start is not None:
            state.update((start, end, cnt))
            state.setTimeoutTimestamp((end + gap_ns) // 1_000_000)
        if closed:
            yield emit(closed)

    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_SESSION_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
