"""Bounded-memory heavy-hitters (tier-C "novel sketch" extension).

The reference has no sketches (its whole analytic surface is the Cypher
subset in ``/root/reference/src/crwling.py:47-56`` / ``cypher.txt:4-8``);
this adds the one frequency sketch a training-data pipeline leans on:
"which tokens/domains/users dominate the corpus" over a universe far too
large to groupBy.

Two-phase plan, the scale-honest shape for 100 TB:

1. **Sketch shortlist** — each partition runs a Misra-Gries summary of
   ``capacity`` counters over its rows inside one ``mapInPandas`` pass:
   bounded memory, NO shuffle of the token universe. The union of
   per-partition summaries is a guaranteed superset of every token with
   global frequency > n/capacity (if a token's global count beats
   n/capacity, some partition has it beating its local n_p/capacity).
2. **Exact verify** — the original rows are semi-joined to the
   (broadcast) candidate list and exactly counted; only tokens with
   frequency > ``frac``·n survive. The shuffle carries partial counts
   of the shortlist only — O(candidates × partitions), not O(universe).

With ``capacity >= 2/frac`` the shortlist provably contains every true
heavy hitter, so the final output is EXACT — which is why a plain SQL
``GROUP BY … HAVING count > frac*n`` can serve as the value oracle for
an approximate-sketch pipeline (same self-validating pattern as the
C25 HLL/GK entry).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def heavy_hitters(
    items: DataFrame,
    col: str = "token",
    frac: float = 0.002,
    capacity: int | None = None,
) -> DataFrame:
    """Exact frequencies of every value of ``col`` whose count exceeds
    ``frac`` of the total row count, found via a Misra-Gries shortlist.

    ``capacity`` defaults to ``ceil(2/frac)`` — twice the minimum that
    guarantees no true heavy hitter is missed. Output: ``(token, freq)``.
    """
    if not 0 < frac < 1:
        raise ValueError("frac must be in (0, 1)")
    if capacity is None:
        capacity = int(math.ceil(2.0 / frac))
    if capacity < math.ceil(1.0 / frac):
        raise ValueError("capacity below 1/frac loses the superset guarantee")

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # one Misra-Gries summary per PARTITION (the iterator spans all
        # of the partition's Arrow batches); the decrement step subtracts
        # the current minimum from every counter and drops zeros —
        # amortized O(rows) across a partition
        counters: dict[str, int] = {}
        n = 0
        for pdf in batches:
            vc = pdf[col].value_counts()
            n += int(vc.sum())
            for tok, c in vc.items():
                counters[tok] = counters.get(tok, 0) + int(c)
            while len(counters) > capacity:
                d = min(counters.values())
                counters = {t: c - d for t, c in counters.items() if c > d}
        out = pd.DataFrame(
            {
                "token": pd.Series(list(counters), dtype="object"),
                "est": pd.Series(list(counters.values()), dtype="int64"),
                "part_n": pd.Series([0] * len(counters), dtype="int64"),
            }
        )
        marker = pd.DataFrame(
            {"token": [None], "est": [0], "part_n": [n]}
        )
        yield pd.concat([out, marker], ignore_index=True)

    summaries = items.select(col).mapInPandas(
        summarize, "token string, est long, part_n long"
    # materialized once, read twice (total + candidates); blocks are
    # reclaimed by the ContextCleaner when the result is released
    ).localCheckpoint(eager=False)

    total = F.broadcast(summaries.agg(F.sum("part_n").alias("_total")))
    cands = summaries.filter(F.col("token").isNotNull()).select("token").distinct()
    exact = (
        items.select(F.col(col).alias("token"))
        .join(F.broadcast(cands), on="token", how="left_semi")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    return (
        exact.crossJoin(total)
        .filter(F.col("freq") > F.lit(frac) * F.col("_total"))
        .select("token", F.col("freq").cast("bigint").alias("freq"))
    )


def bloom_build(
    keys: DataFrame,
    key_col: str,
    m_bits: int = 4096,
    k: int = 3,
) -> DataFrame:
    """Build a Bloom filter over a key column as a 1-row DataFrame
    ``(bloom map<int,bigint>)`` — word index → 64-bit mask.

    The runtime-filter primitive behind every "don't shuffle the fact
    table" plan at 100 TB: the filter is ``m_bits/64`` longs regardless
    of key count (4 KiB here), so it broadcasts for free and the probe
    side prunes BEFORE its shuffle — a semi-join whose network cost is
    zero on the big side. Hash functions are the engine's md5-fold
    (functions/hashing.py: ``conv(substr(md5(salt||key),1,15),16,10)``,
    salts ``bloom0: … bloom{k-1}:``), so the exact bit pattern — and
    therefore the exact false-positive set — replays in plain SQL.

    Build cost: one explode (k rows per key) + one ``groupBy(word)``
    bit_or over ≤ ``m_bits/64`` groups — map-side combine collapses it
    to almost nothing.
    """
    from neo4j_graphdb_spark.functions.hashing import md5_bucket

    pos = keys.select(
        F.explode(
            F.array(
                *[md5_bucket(key_col, f"bloom{i}:", m_bits) for i in range(k)]
            )
        ).alias("pos")
    )
    return (
        pos.select(
            F.expr("cast(pos div 64 as int)").alias("w"),
            F.expr("shiftleft(cast(1 as bigint), cast(pos % 64 as int))").alias(
                "m"
            ),
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("mask"))
        .agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("w", "mask")))
            ).alias("bloom")
        )
    )


def bloom_semi_join(
    facts: DataFrame,
    fact_key: str,
    keys: DataFrame,
    key_col: str,
    m_bits: int = 4096,
    k: int = 3,
) -> DataFrame:
    """Filter ``facts`` to rows whose ``fact_key`` passes the Bloom
    filter built from ``keys`` — a may-contain pre-filter with false
    positives and no false negatives (chase with an exact semi-join when
    exactness matters; the point is that the exact join then runs on the
    surviving sliver, so the big side never shuffles unpruned). All
    probe arithmetic is column expressions against the broadcast 1-row
    filter: no shuffle, no UDF, and because the hashes are the md5-fold
    the candidate set — false positives included — is deterministic and
    SQL-replayable."""
    from neo4j_graphdb_spark.functions.hashing import md5_bucket

    bloom = bloom_build(keys, key_col, m_bits=m_bits, k=k)
    probed = facts.crossJoin(F.broadcast(bloom))
    for i in range(k):
        probed = probed.withColumn(f"_p{i}", md5_bucket(fact_key, f"bloom{i}:", m_bits))
    cond = F.lit(True)
    for i in range(k):
        # bit i set?  word = pos div 64, mask = 1 << (pos % 64); a word
        # absent from the map means no key ever touched it -> 0
        cond = cond & F.expr(
            f"(coalesce(element_at(bloom, cast(_p{i} div 64 as int)), cast(0 as bigint)) "
            f"& shiftleft(cast(1 as bigint), cast(_p{i} % 64 as int))) != 0"
        )
    return probed.filter(cond).drop("bloom", *[f"_p{i}" for i in range(k)])


def hll_cardinality(
    df: DataFrame,
    key_col: str,
    group_col: str,
    p: int = 10,
) -> DataFrame:
    """Deterministic HyperLogLog cardinality per group (Flajolet et al.
    2007) — the mergeable sketch behind every 100 TB "how many distinct
    X" answer — built so the WHOLE estimate replays bit-for-bit in SQL
    (unlike ``approx_count_distinct``, whose HLL++ registers are
    engine-internal): the 60-bit md5-fold hash splits into a ``2^p``
    bucket head and a remainder whose leading-zero rank comes from the
    LENGTH OF ITS BINARY STRING (an exact integer — no float log2 whose
    libm rounding could differ across engines).

    Register state is one ``groupBy(group, bucket).max(rank)`` —
    integer max is order-free and map-side combinable, and IS the
    mergeable sketch: union of corpora = max of registers, the property
    that lets 1000 executors sketch independently and merge in
    O(2^p). The harmonic mean's ``Σ 2^-M[j]`` is computed EXACTLY as a
    ``Σ 2^(60-M[j])`` decimal at fixed point (no float sum → no
    partition-order sensitivity), empty registers contributing ``2^60``
    each; one final double division + the standard linear-counting
    small-range branch give the estimate.

    Returns ``(group_col, occupied, exact_nd, est, rel_err)`` — the
    exact distinct count rides along, so the entry self-reports its
    error the way c57/c76 measure recall instead of assuming it.
    """
    hashed = df.select(
        F.col(group_col),
        hll_bucket(F.col(key_col), p).alias("_b"),
        hll_rank(F.col(key_col), p).alias("_r"),
    )
    regs = hashed.groupBy(group_col, "_b").agg(F.max("_r").alias("_m"))
    exact = df.groupBy(group_col).agg(
        F.countDistinct(key_col).alias("exact_nd")
    )
    return (
        hll_estimate(regs, [group_col], p)
        .join(exact, on=group_col)
        .select(
            group_col,
            F.col("occupied").cast("bigint").alias("occupied"),
            F.col("exact_nd").cast("bigint").alias("exact_nd"),
            F.round(F.col("_est"), 6).alias("est"),
            F.round(
                (F.col("_est") - F.col("exact_nd")) / F.col("exact_nd"), 6
            ).alias("rel_err"),
        )
    )


def hll_bucket(key, p: int):
    """Register index of ``key``: top ``p`` bits of the 60-bit md5 fold."""
    from neo4j_graphdb_spark.operators.dedup import _md5_60

    h = _md5_60(F.concat(F.lit("hll:"), key.cast("string")))
    return F.shiftright(h, 60 - p)


def hll_rank(key, p: int):
    """Leading-zero rank of the hash remainder + 1, via the exact
    binary-string-length path (no float log2)."""
    from neo4j_graphdb_spark.operators.dedup import _md5_60

    rem_bits = 60 - p
    h = _md5_60(F.concat(F.lit("hll:"), key.cast("string")))
    rem = h % F.lit(1 << rem_bits)
    return (
        F.when(rem == 0, F.lit(rem_bits + 1))
        .otherwise(
            F.lit(rem_bits) - F.length(F.conv(rem.cast("string"), 10, 2)) + 1
        )
        .cast("int")
    )


def hll_estimate(regs: DataFrame, group_cols: list, p: int) -> DataFrame:
    """Finalize HLL registers ``(group…, _b, _m)`` into per-group
    ``(group…, occupied, _est)`` — fixed-point decimal harmonic sum +
    linear-counting branch. Split out so STREAMED registers (a
    streaming ``max`` aggregation, the one stateful op) finalize with
    the identical math as batch ones."""
    m = 1 << p
    per_g = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("occupied"),
        F.sum(
            F.expr("shiftleft(cast(1 as bigint), cast(60 - _m as int))").cast(
                "decimal(38,0)"
            )
        ).alias("_s_occ"),
    )
    v = F.lit(m) - F.col("occupied")
    s_scaled = F.col("_s_occ") + v.cast("decimal(38,0)") * F.lit(1 << 60).cast(
        "decimal(38,0)"
    )
    s = s_scaled.cast("double") / F.lit(float(1 << 60))
    alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(float(m)))
    e_raw = alpha * F.lit(m) * F.lit(m) / s
    est = F.when(
        (e_raw <= F.lit(2.5) * F.lit(m)) & (v > 0),
        F.lit(m) * F.ln(F.lit(m) / v),
    ).otherwise(e_raw)
    return per_g.select(*group_cols, "occupied", est.alias("_est"))


def count_min_sketch(
    tokens: DataFrame,
    token_col: str = "tok",
    depth: int = 4,
    width: int = 512,
    top_k: int = 20,
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) — frequency
    estimation in ``depth × width`` integer cells over a token universe
    too large to groupBy, with the one-sided guarantee
    ``estimate ≥ true`` (collisions only ever ADD). Hashes are the
    salted md5-fold (deterministic, SQL-replayable); cell updates are
    INTEGER sums (map-side combinable, order-free), which is also the
    merge rule — sketches of shards add cell-wise, the property that
    lets executors sketch independently.

    Self-measuring output (the c57/c76/c117 discipline): the ``top_k``
    exact-top tokens are point-queried through the sketch, so every row
    reports ``(token, exact, cms_est, overcount)`` with
    ``overcount ≥ 0`` by construction — the entry PROVES its error
    bound on fixture data instead of assuming it.

    Scale shape: one explode to (row, bucket) cell increments, one
    2048-cell aggregation; point queries broadcast-join the tiny cell
    table. Nothing anywhere is proportional to the token universe
    except the exact-verify side (which exists only for the
    self-measurement, not for the sketch itself).
    """
    from neo4j_graphdb_spark.functions.hashing import md5_bucket

    toks = tokens.select(F.col(token_col).alias("tok"))
    bucket_arr = F.array(
        *[md5_bucket("tok", f"cms{i}:", width) for i in range(depth)]
    )
    cells = (
        toks.select(F.posexplode(bucket_arr).alias("r", "bucket"))
        .groupBy("r", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    exact = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("exact"))
    top = exact.orderBy(F.col("exact").desc(), F.col("tok").asc()).limit(top_k)
    probes = top.select(
        "tok", "exact", F.posexplode(bucket_arr).alias("r", "bucket")
    )
    est = (
        probes.join(F.broadcast(cells), on=["r", "bucket"])
        .groupBy("tok", "exact")
        .agg(F.min("cnt").alias("cms_est"))
    )
    return est.select(
        "tok",
        F.col("exact").cast("bigint").alias("exact"),
        F.col("cms_est").cast("bigint").alias("cms_est"),
        (F.col("cms_est") - F.col("exact")).cast("bigint").alias("overcount"),
    )


# Poisson(1) inverse-CDF thresholds scaled to the 60-bit hash range:
# floor(CDF(k) * 2^60) for k = 0..5 (tail mass beyond 6 ≈ 5e-5 folds
# into the last bucket). Integer literals, so both engines compare the
# SAME constants against the SAME fold — no float CDF at query time.
_POISSON1_CUTS = [
    424136118829305344,   # P(X<=0) = e^-1
    848272237658610688,   # P(X<=1)
    1060340297073263360,  # P(X<=2)
    1131029650211480960,  # P(X<=3)
    1148701988496035328,  # P(X<=4)
    1152236456152946176,  # P(X<=5)
]


def bootstrap_ci(
    df: DataFrame,
    key_col: str,
    value_col: str,
    group_col: str,
    replicates: int = 100,
    lo: float = 0.025,
    hi: float = 0.975,
) -> DataFrame:
    """Deterministic Poisson bootstrap confidence interval for a
    per-group MEAN — the "how sure are we" layer a curation dashboard
    needs over every corpus metric, in the only form that distributes:
    the Poisson bootstrap (each row enters replicate *b* with weight
    ~ Poisson(1), independently — no global resample, so replicates
    build in ONE pass over ``replicates × rows`` exploded rows, shuffled
    by group like any aggregation).

    Every "random" weight is the salted md5-fold of ``(key, b)`` pushed
    through a PRE-SCALED integer inverse-CDF table (``_POISSON1_CUTS``)
    — no RNG, no runtime float CDF — and ``value_col`` must be integer,
    so replicate sums are EXACT integer aggregates (order-free; the
    division into a mean happens once per replicate). The CI is the
    [``lo``, ``hi``] empirical quantile of the ``replicates`` means,
    taken at integer ranks over a (group, replicate)-sized frame —
    tiny, sortable, deterministic.

    Returns ``(group_col, n, point_mean, ci_lo, ci_hi)``, all rounded
    to 6 dp.
    """
    from pyspark.sql import Window

    from neo4j_graphdb_spark.operators.dedup import _md5_60

    reps = df.select(
        F.col(group_col),
        F.col(key_col),
        F.col(value_col).cast("long").alias("_v"),
        F.explode(F.sequence(F.lit(0), F.lit(replicates - 1))).alias("_b"),
    )
    h = _md5_60(
        F.concat(
            F.lit("boot:"),
            F.col(key_col).cast("string"),
            F.lit(":"),
            F.col("_b").cast("string"),
        )
    )
    w = F.lit(len(_POISSON1_CUTS))
    for k in range(len(_POISSON1_CUTS) - 1, -1, -1):
        w = F.when(h < F.lit(_POISSON1_CUTS[k]), F.lit(k)).otherwise(w)
    means = (
        reps.withColumn("_w", w)
        .groupBy(group_col, "_b")
        .agg(
            F.sum(F.col("_w") * F.col("_v")).alias("_ws"),
            F.sum("_w").alias("_wn"),
        )
        .filter(F.col("_wn") > 0)
        .select(
            group_col,
            "_b",
            (F.col("_ws").cast("double") / F.col("_wn")).alias("_mean"),
        )
    )
    ord_w = Window.partitionBy(group_col).orderBy(F.col("_mean").asc(), F.col("_b").asc())
    ranked = means.withColumn("_rn", F.row_number().over(ord_w)).withColumn(
        "_nb", F.count(F.lit(1)).over(Window.partitionBy(group_col))
    )
    lo_rank = F.greatest(F.ceil(F.lit(lo) * F.col("_nb")).cast("int"), F.lit(1))
    hi_rank = F.least(
        F.ceil(F.lit(hi) * F.col("_nb")).cast("int"), F.col("_nb").cast("int")
    )
    bounds = ranked.groupBy(group_col).agg(
        F.min(F.when(F.col("_rn") == lo_rank, F.col("_mean"))).alias("_lo"),
        F.min(F.when(F.col("_rn") == hi_rank, F.col("_mean"))).alias("_hi"),
    )
    point = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(value_col).cast("long")).alias("_s"),
    )
    return point.join(bounds, on=group_col).select(
        group_col,
        F.col("n").cast("bigint").alias("n"),
        F.round(F.col("_s").cast("double") / F.col("n"), 6).alias("point_mean"),
        F.round("_lo", 6).alias("ci_lo"),
        F.round("_hi", 6).alias("ci_hi"),
    )
