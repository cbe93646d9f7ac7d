"""Stream-stream joins (tier-C extension, completing the Structured
Streaming surface next to windows/stateful/dedup).

The reference has no streaming at all (its loop is a synchronous batch
crawler, ``/root/reference/src/crwling.py:109-186``); this is the
engine-native continuation of :mod:`operators.temporal`: the same
click/purchase alignment ``range_join`` computes in batch, expressed as
a watermarked stream-stream join that Structured Streaming executes
incrementally with bounded state.

Scale notes: a stream-stream join keys its state store on the equi-join
columns, and the event-time range condition is what lets the engine
EVICT state — without it, both sides buffer forever. Watermark + range
bound state to O(window × arrival rate) per key, independent of stream
length, which is the difference between a demo and a 100 TB/day join.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    window_sec: float,
    ts_col: str = "ts",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Join two event streams on ``key_cols`` where the right event falls
    in ``[left_ts - window_sec, left_ts)`` — the streaming twin of
    :func:`operators.temporal.range_join` (same interval, same
    ``gap_sec`` output), with watermarks on both sides so the state store
    evicts rows once they can no longer match.

    Output: the key columns, all other columns prefixed ``l_``/``r_``,
    plus ``gap_sec = left_ts - right_ts`` in ``(0, window_sec]``.

    Batch/stream agnostic: on batch inputs Spark plans an ordinary join
    with the same predicate, so one definition serves both engines (and
    the DuckDB oracle).
    """
    if ts_col in key_cols:
        raise ValueError(
            f"ts_col {ts_col!r} cannot be a join key — it carries the "
            "interval condition and is prefixed l_/r_ on each side"
        )
    lcols = [c for c in left.columns if c not in key_cols]
    rcols = [c for c in right.columns if c not in key_cols]
    l = left.select(
        *key_cols, *[F.col(c).alias(f"l_{c}") for c in lcols]
    )
    r = right.select(
        *[F.col(k).alias(f"_rk_{k}") for k in key_cols],
        *[F.col(c).alias(f"r_{c}") for c in rcols],
    )
    if left.isStreaming or right.isStreaming:
        l = l.withWatermark(f"l_{ts_col}", watermark)
        r = r.withWatermark(f"r_{ts_col}", watermark)
    lts, rts = F.col(f"l_{ts_col}"), F.col(f"r_{ts_col}")
    gap = lts.cast("double") - rts.cast("double")
    cond = reduce(
        lambda a, b: a & b,
        [F.col(k) == F.col(f"_rk_{k}") for k in key_cols]
        + [gap > 0, gap <= window_sec],
    )
    return (
        l.join(r, on=cond, how=how)
        .drop(*[f"_rk_{k}" for k in key_cols])
        .withColumn("gap_sec", gap)
    )


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    on: list[str],
    how: str = "inner",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Enrich an event stream with a static dimension table — the
    standard "decorate the firehose" pattern (events × user profile,
    clicks × catalog). Structured Streaming plans this as a stateless
    per-batch join: no state store, no watermark needed, and the static
    side is re-read each trigger, so slowly-changing dimensions pick up
    new snapshots between batches.

    ``broadcast_dim`` (default) hints the dimension to every executor —
    at 100 TB/day of events the stream side must never shuffle for a
    dimension lookup. Set it False only when the dimension itself is too
    big to broadcast (the join then shuffles both sides on ``on``).

    Batch/stream agnostic like :func:`stream_interval_join` — on a batch
    input it is a plain join with identical semantics, which is exactly
    what the DuckDB oracle runs.
    """
    d = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(d, on=on, how=how)
