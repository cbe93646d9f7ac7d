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
