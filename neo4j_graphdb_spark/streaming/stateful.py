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
