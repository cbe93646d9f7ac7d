"""Temporal joins over event streams (tier-C extension; BASELINE.json
north star — training-data pipelines sessionize and align event logs).

The reference has no temporal operators (its only timestamp is the
server-side ``datetime()`` SET, ``/root/reference/src/crwling.py:51``);
these generalize the ``events`` fixture stream the way a feature/label
alignment stage would:

* :func:`asof_join` — for each left event, the most recent right event at
  or before it, per key (backward-inclusive merge-as-of). Implemented as
  union + ordered window ``last(ignorenulls)`` — ONE shuffle on the key,
  no per-row join, no inequality join: the pattern scales to arbitrarily
  long histories because each row is touched exactly once.
* :func:`range_join` — (left, right) pairs of the same key with
  ``right_ts`` in ``[left_ts - window, left_ts)``. Implemented with
  time-bucket blocking (bucket width = window; each left probes its own
  and the previous bucket), so the join is a 2×-fanout equi-join, never
  an O(n²) inequality join — the plan you want when both sides are
  100 TB event logs.

Both are exact operators with DuckDB oracles (``ASOF JOIN`` / plain
inequality join at fixture scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_m",
) -> DataFrame:
    """Backward-inclusive as-of join: every ``left`` row is matched with
    the latest ``right`` row whose ``ts_col`` <= the left row's, sharing
    ``key_cols``; unmatched left rows keep NULL match columns.

    Right rows must be unique per (key, ts) for a deterministic result
    (true of the fixtures; enforceable upstream with a window dedup).
    """
    right_cols = right_cols or [
        c for c in right.columns if c not in set(key_cols) | {ts_col}
    ]
    lp = [c for c in left.columns if c not in set(key_cols) | {ts_col}]

    l_tagged = left.select(
        *key_cols,
        F.col(ts_col),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in lp],
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(c + suffix) for c in right_cols],
    )
    r_tagged = right.select(
        *key_cols,
        F.col(ts_col),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in lp],
        *[F.col(c).alias(c + suffix) for c in right_cols],
    )
    # right rows sort before left rows at equal ts → inclusive match
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l_tagged.unionByName(r_tagged).select(
        "*",
        *[
            F.last(F.col(c + suffix), ignorenulls=True).over(w).alias("_f" + c)
            for c in right_cols
        ],
    )
    return (
        filled.filter(F.col("_side") == 1)
        .select(
            *key_cols,
            ts_col,
            *lp,
            *[F.col("_f" + c).alias(c + suffix) for c in right_cols],
        )
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    window_sec: float,
    left_ts: str = "ts",
    right_ts: str = "ts",
) -> DataFrame:
    """All (left, right) pairs with the same key where the right event
    falls in ``[left_ts - window_sec, left_ts)`` — strictly before the
    left event (simultaneous events excluded), back to and including the
    exact window boundary; equivalently ``gap_sec = left_ts - right_ts``
    in ``(0, window_sec]``.

    Blocking: both sides bucket at ``floor(epoch / window_sec)``; a match
    can only live in the left row's own or previous bucket, so the left
    side probes exactly two buckets (explode ×2) and the join stays a
    hash equi-join on (key, bucket) with the exact band as a residual
    filter. Returns all left/right columns prefixed ``l_``/``r_`` plus
    ``gap_sec = left_ts - right_ts``.
    """
    le = F.col("l_" + left_ts).cast("double")
    re_ = F.col("r_" + right_ts).cast("double")

    lsel = left.select(
        *[F.col(c) for c in key_cols],
        *[F.col(c).alias("l_" + c) for c in left.columns if c not in key_cols],
    )
    rsel = right.select(
        *[F.col(c) for c in key_cols],
        *[F.col(c).alias("r_" + c) for c in right.columns if c not in key_cols],
    )
    lb = F.floor(F.col("l_" + left_ts).cast("double") / F.lit(window_sec))
    rb = F.floor(F.col("r_" + right_ts).cast("double") / F.lit(window_sec))
    lprobe = lsel.withColumn("_b", F.explode(F.array(lb - 1, lb)))
    rtag = rsel.withColumn("_b", rb)
    return (
        lprobe.join(rtag, on=key_cols + ["_b"])
        .filter((le - re_ > 0) & (le - re_ <= window_sec))
        .select(
            *key_cols,
            *[c for c in lprobe.columns if c.startswith("l_")],
            *[c for c in rtag.columns if c.startswith("r_")],
            (le - re_).alias("gap_sec"),
        )
    )
