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
* :func:`time_rollup` — hypertable-style multi-resolution continuous
  aggregate: the finest resolution aggregates the raw events (the only
  full-data shuffle), every coarser resolution re-aggregates the
  previous rollup — the TimescaleDB continuous-aggregate cascade.

All are exact operators with DuckDB oracles (``ASOF JOIN`` / plain
inequality join / per-resolution GROUP BY at fixture scale).
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


def time_rollup(
    df: DataFrame,
    ts_col: str = "ts",
    dims: list[str] | None = None,
    value_col: str = "value",
    resolutions: tuple[str, ...] = ("minute", "hour", "day"),
) -> DataFrame:
    """Hypertable-style rollup: one row per (resolution, time bucket,
    dims) with count/sum/min/max of ``value_col``, for every resolution
    in the coarsening chain.

    The at-scale shape is hierarchical: the finest resolution is the
    ONLY aggregation that shuffles the raw events; each coarser level
    re-aggregates the previous rollup, whose size is bounded by buckets
    × dims, not by events — at 100 TB the hour and day levels are
    re-aggs of a table ~6 orders of magnitude smaller than the input.
    Sums run over ``decimal(18,6)``, which is associative (unlike
    float), so the cascade is value-identical to aggregating each
    resolution directly from the raw events — that identity is exactly
    what the DuckDB oracle checks. Count/min/max are associative by
    nature.

    ``resolutions`` must be ordered finest→coarsest with each entry a
    valid ``date_trunc`` unit coarser than the previous.
    """
    dims = dims or []
    finest = resolutions[0]
    # each level is lazily checkpointed so the union's coarser branches
    # physically re-aggregate the PREVIOUS rollup's materialized blocks
    # instead of re-running the raw-event aggregation per branch (the
    # static plan otherwise duplicates the finest exchange once per
    # resolution); blocks are reclaimed by the ContextCleaner when the
    # result is released
    cur = (
        df.groupBy(F.date_trunc(finest, F.col(ts_col)).alias("bucket"), *dims)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(18,6)")).alias("_s"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
        .localCheckpoint(eager=False)
    )
    levels = [(finest, cur)]
    for res in resolutions[1:]:
        cur = (
            cur.groupBy(F.date_trunc(res, F.col("bucket")).alias("bucket"), *dims)
            .agg(
                F.sum("n_events").cast("bigint").alias("n_events"),
                F.sum("_s").alias("_s"),
                F.min("min_value").alias("min_value"),
                F.max("max_value").alias("max_value"),
            )
            .localCheckpoint(eager=False)
        )
        levels.append((res, cur))
    out = None
    for res, frame in levels:
        tagged = frame.select(
            F.lit(res).alias("resolution"),
            "bucket",
            *dims,
            "n_events",
            F.round(F.col("_s").cast("double"), 6).alias("sum_value"),
            F.round("min_value", 6).alias("min_value"),
            F.round("max_value", 6).alias("max_value"),
        )
        out = tagged if out is None else out.unionByName(tagged)
    return out


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


def gap_fill(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    bucket_sec: int = 300,
) -> DataFrame:
    """Hypertable-style gap-fill: bucket events to a fixed-width time
    grid per key, materialize EVERY bucket between the key's first and
    last observation, and fill the empty ones two ways —
    last-observation-carried-forward (``value_locf``, TimescaleDB
    ``locf()``) and linear interpolation between the surrounding
    observations (``value_interp``, TimescaleDB ``interpolate()``).
    Leading buckets (before the first observation) stay NULL in both;
    trailing buckets (after the last) carry the LOCF value but NULL
    interpolation, matching the TimescaleDB functions.

    Scale shape: the raw events are touched exactly once (the per-bucket
    aggregation — the only full-data shuffle); everything downstream is
    bounded by grid size (keys × span/bucket), not event count, so at
    100 TB the fill itself runs over a table orders of magnitude smaller
    than the input. The grid is built with ``sequence``+``explode`` over
    bucket INDICES (bigint), never a driver-side loop, and the fill is
    one ordered window per key. A key whose span/bucket ratio exceeds
    ~10^7 buckets would need the window split into epoch-range chunks;
    at that point the bucket width is wrong for the data.

    The per-bucket observed value is the bucket SUM over
    ``decimal(18,6)`` rounded to 6 dp — associative and therefore
    bit-identical to the DuckDB oracle regardless of partitioning (an
    average would divide, and double tie-rounding at the 6th decimal
    differs between engines). Interpolation is emitted UNROUNDED: its
    inputs are those identical rounded doubles plus integer bucket
    indices, so the single IEEE expression evaluates to the same bits
    on both sides.
    """
    b = F.floor(F.col(ts_col).cast("double") / F.lit(bucket_sec)).cast("bigint")
    # lazy checkpoint: the static plan otherwise inlines this raw-event
    # aggregation into BOTH the span/grid branch and the join's probe
    # side, re-scanning the input once per branch — with it, the grid
    # and the fill reuse the one materialized bucket table
    obs = (
        df.groupBy(*key_cols, b.alias("_b"))
        .agg(F.sum(F.col(value_col).cast("decimal(18,6)")).alias("_s"))
        .select(
            *key_cols,
            "_b",
            F.round(F.col("_s").cast("double"), 6).alias("_obs"),
        )
        .localCheckpoint(eager=False)
    )
    spans = obs.groupBy(*key_cols).agg(
        F.min("_b").alias("_b0"), F.max("_b").alias("_b1")
    )
    grid = spans.select(
        *key_cols, F.explode(F.sequence("_b0", "_b1")).alias("_b")
    )
    w_back = (
        Window.partitionBy(*key_cols)
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # the "next observation" lookup is EXPRESSED as last-over-a-growing
    # frame in DESCENDING bucket order, not first-over-unboundedFollowing:
    # Spark executes currentRow→unboundedFollowing frames by rescanning
    # the partition tail per row (O(n²) per key — measured 10s vs 1s on
    # a 8.6k-bucket grid), while unboundedPreceding→currentRow frames
    # update incrementally (O(n)); the reversed sort buys the linear
    # frame at the cost of one extra partition sort
    w_fwd_rev = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("_b").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    obs_b = F.when(F.col("_obs").isNotNull(), F.col("_b"))
    filled = (
        grid.join(obs, on=[*key_cols, "_b"], how="left")
        .select(
            *key_cols,
            "_b",
            "_obs",
            F.last("_obs", ignorenulls=True).over(w_back).alias("_pv"),
            F.last(obs_b, ignorenulls=True).over(w_back).alias("_pb"),
            F.last("_obs", ignorenulls=True).over(w_fwd_rev).alias("_nv"),
            F.last(obs_b, ignorenulls=True).over(w_fwd_rev).alias("_nb"),
        )
    )
    interp = F.when(F.col("_obs").isNotNull(), F.col("_obs")).otherwise(
        F.col("_pv")
        + (F.col("_nv") - F.col("_pv"))
        * (
            (F.col("_b") - F.col("_pb")).cast("double")
            / (F.col("_nb") - F.col("_pb")).cast("double")
        )
    )
    return filled.select(
        *key_cols,
        F.timestamp_seconds(F.col("_b") * bucket_sec).alias("bucket"),
        F.col("_obs").isNotNull().alias("is_observed"),
        F.col("_pv").alias("value_locf"),
        interp.alias("value_interp"),
    )


def incremental_rollup(
    spark,
    versions,
    new_events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    resolution: str = "minute",
) -> DataFrame:
    """C55 — materialized-view maintenance, batch form: fold a NEW slice
    of events into the stored per-bucket rollup instead of recomputing
    from all history — the incremental-ETL primitive behind TimescaleDB
    continuous aggregates / Materialize-style view upkeep, here as a
    versioned-table merge (``writer.TableVersions``: write-next + atomic
    pointer swap, crash-safe like every store write).

    The fold is exact: counts add, sums add in ``decimal(18,6)``
    (associative — the same reason :func:`time_rollup`'s cascade is
    value-identical to direct aggregation), min/max fold by
    least/greatest. So N incremental merges ≡ one full recompute,
    bit-for-bit — which is exactly what the oracle checks.

    Scale shape: the delta aggregates with one shuffle over the NEW
    events only; the combine is a full-outer join of two bucket tables,
    each bounded by time-buckets — at 100 TB the raw history is never
    re-read, which is the whole point.
    """
    delta = new_events.groupBy(
        F.date_trunc(resolution, F.col(ts_col)).alias("bucket")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(F.col(value_col).cast("decimal(18,6)")).alias("sum_value"),
        F.min(value_col).alias("min_value"),
        F.max(value_col).alias("max_value"),
    )
    cur = versions.read(spark)
    if cur is None:
        merged = delta
    else:
        old, new = cur.alias("old"), delta.alias("new")
        merged = old.join(new, on="bucket", how="full_outer").select(
            "bucket",
            (
                F.coalesce(F.col("old.n_events"), F.lit(0))
                + F.coalesce(F.col("new.n_events"), F.lit(0))
            ).cast("bigint").alias("n_events"),
            (
                F.coalesce(F.col("old.sum_value"), F.lit(0).cast("decimal(18,6)"))
                + F.coalesce(F.col("new.sum_value"), F.lit(0).cast("decimal(18,6)"))
            ).cast("decimal(18,6)").alias("sum_value"),
            F.coalesce(
                F.least(F.col("old.min_value"), F.col("new.min_value")),
                F.col("old.min_value"),
                F.col("new.min_value"),
            ).alias("min_value"),
            F.coalesce(
                F.greatest(F.col("old.max_value"), F.col("new.max_value")),
                F.col("old.max_value"),
                F.col("new.max_value"),
            ).alias("max_value"),
        )
    versions.write_next(merged)
    return versions.read(spark)


def sax_words(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    group_col: str,
    days_per_seg: int = 3,
) -> DataFrame:
    """SAX symbolization (Lin et al. 2003) of each group's daily-total
    series: z-normalize, PAA-average into ``days_per_seg``-day
    segments, and map each segment to one of four symbols at the
    standard-normal quartile breakpoints (±0.6744897501960817, 0) —
    the discretization behind time-series motif mining, whose output
    ("series → word") feeds the same shingle/minhash machinery this
    engine already runs on text.

    Every aggregate is EXACT: daily totals and their squares sum as
    decimals (the c35/rel_time_rollup discipline — no float-sum order
    sensitivity), μ and σ fall out of the exact sums via one fixed IEEE
    tree, and the word assembles from a sorted struct array, not an
    order-dependent collect. Returns
    ``(group_col, n_days, mu, sigma, sax_word)`` with μ/σ rounded 6 dp.

    Scale shape: one (group, day) rollup (map-side combinable), one
    (group, segment) rollup over ~30× fewer rows, one per-group
    finalize — a three-level cascade, each level orders of magnitude
    smaller, nothing driver-side.
    """
    b = 0.6744897501960817  # Φ⁻¹(0.75): quartile breakpoints for |A|=4
    day = F.date_trunc("day", F.col(ts_col))
    daily = (
        df.groupBy(F.col(group_col), day.alias("_day"))
        .agg(F.sum(F.col(value_col).cast("decimal(18,6)")).alias("_dsum"))
    ).localCheckpoint(eager=False)  # feeds stats + segments
    stats = daily.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("_dsum").alias("_s1"),
        F.sum(F.col("_dsum") * F.col("_dsum")).alias("_s2"),
        F.min("_day").alias("_d0"),
    )
    mu = F.col("_s1").cast("double") / F.col("n_days")
    sigma = F.sqrt(
        F.col("_s2").cast("double") / F.col("n_days") - mu * mu
    )
    seg = (
        daily.join(
            F.broadcast(stats.select(group_col, "_d0")), on=group_col
        )
        .withColumn(
            "_seg",
            F.expr(f"datediff(_day, _d0) div {int(days_per_seg)}"),
        )
        .groupBy(group_col, "_seg")
        .agg(
            F.sum("_dsum").alias("_ssum"),
            F.count(F.lit(1)).alias("_ndays"),
        )
    )
    z = (
        F.col("_ssum").cast("double") / F.col("_ndays") - F.col("_mu")
    ) / F.col("_sigma")
    sym = (
        F.when(z < F.lit(-b), F.lit("a"))
        .when(z < F.lit(0.0), F.lit("b"))
        .when(z < F.lit(b), F.lit("c"))
        .otherwise(F.lit("d"))
    )
    symbols = (
        seg.join(
            F.broadcast(
                stats.select(
                    group_col,
                    "n_days",
                    mu.alias("_mu"),
                    sigma.alias("_sigma"),
                )
            ),
            on=group_col,
        )
        .select(group_col, "n_days", "_mu", "_sigma", "_seg", sym.alias("_sym"))
    )
    return (
        symbols.groupBy(group_col, "n_days", "_mu", "_sigma")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_seg", "_sym"))),
                    lambda s: s["_sym"],
                ),
                "",
            ).alias("sax_word")
        )
        .select(
            group_col,
            F.col("n_days").cast("bigint").alias("n_days"),
            F.round("_mu", 6).alias("mu"),
            F.round("_sigma", 6).alias("sigma"),
            "sax_word",
        )
    )
