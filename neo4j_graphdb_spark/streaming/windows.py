"""Event-time windowed aggregation + stateful dedup (tier C14-C17).

These transformations are stream/batch agnostic — the same function works
on a ``readStream`` DataFrame (incremental state-store execution) and on a
batch DataFrame (ordinary hash agg), which is exactly how Structured
Streaming is meant to be used. Watermarks bound state at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str = "ts",
    width: str = "1 hour",
    watermark: str | None = None,
    group_extra: list[str] | None = None,
    value_col: str | None = None,
) -> DataFrame:
    """C14 — tumbling window count (+ sum of ``value_col`` when given)
    over event time. Works on any input schema: only ``ts_col`` (and the
    optional ``value_col``/``group_extra``) must exist."""
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    keys = [F.window(F.col(ts_col), width).alias("w")] + [
        F.col(c) for c in (group_extra or [])
    ]
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias(f"sum_{value_col}"))
    out_cols = [F.col("w.start").alias("window_start")] + [
        F.col(c) for c in (group_extra or [])
    ] + ["n_events"] + ([f"sum_{value_col}"] if value_col is not None else [])
    return df.groupBy(*keys).agg(*aggs).select(*out_cols)


def sliding_window_agg(
    df: DataFrame,
    ts_col: str = "ts",
    width: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """C14 — sliding window (each event lands in width/slide windows)."""
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(F.col(ts_col), width, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), F.col("w.end").alias("window_end"), "n_events")
    )


def session_window_agg(
    df: DataFrame,
    ts_col: str = "ts",
    gap: str = "5 minutes",
    key_col: str = "user_id",
    watermark: str | None = None,
) -> DataFrame:
    """C15 — session windows: events within ``gap`` of each other merge."""
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.session_window(F.col(ts_col), gap).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(key_col),
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def stream_dedup(df: DataFrame, key_cols: list[str], ts_col: str = "ts", watermark: str = "1 hour") -> DataFrame:
    """C17 — stateful exactly-once dedup within the watermark horizon."""
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(key_cols)


def windowed_topk(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    width: str = "1 day",
    k: int = 2,
    watermark: str | None = None,
) -> DataFrame:
    """Per-window top-k keys by event count — the dashboard
    "trending items per hour" shape. The aggregation half
    (window × key counts) is stream/batch agnostic exactly like
    :func:`tumbling_window_agg`; the rank half is a per-window
    row_number (deterministic: count desc, key asc), which streaming
    runs inside ``foreachBatch`` over the agg's complete-mode output —
    the documented Structured Streaming pattern for global ranks, since
    a rank is only meaningful once a window's counts are final (i.e.
    past the watermark). State is bounded by (windows in watermark) ×
    (distinct keys); the rank input is the AGGREGATED frame —
    window-count rows, not events — so the sort is dimension-scale.
    Returns (window_start, key, n_events, rank ≤ k).
    """
    from pyspark.sql import Window as W

    if watermark:
        df = df.withWatermark(ts_col, watermark)
    counts = (
        df.groupBy(
            F.window(F.col(ts_col), width).alias("w"), F.col(key_col)
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"), key_col, "n_events"
        )
    )
    rank_w = W.partitionBy("window_start").orderBy(
        F.col("n_events").desc(), F.col(key_col).asc()
    )
    return (
        counts.withColumn("rank", F.row_number().over(rank_w))
        .filter(F.col("rank") <= k)
    )
