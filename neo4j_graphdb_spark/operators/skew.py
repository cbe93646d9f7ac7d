"""Skew-resistant join (100 TB checklist: "skewed keys hurt — salting
for skew").

A hash equi-join sends every row of a key to ONE reducer; a heavy-hitter
key therefore serializes its whole partition on one task no matter how
many executors exist. :func:`salted_join` splits each big-side key across
``num_salts`` sub-partitions (deterministic per-row salt) and replicates
the small side once per salt — the classic salting rewrite, producing a
bit-identical result to the plain join while bounding any task's share of
a hot key to ``1/num_salts``.

AQE's skew-join splitting (enabled in session.py) handles this at runtime
for sort-merge joins; the explicit operator exists for plans AQE cannot
rewrite (e.g. a broadcast-ineligible small side under a hot key, or
pre-AQE engines) and as the documented pattern for pipeline authors.

The reference has no joins at all (Neo4j executes its Cypher); this is a
BASELINE.json scale extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``on`` with the big side salted.

    Each big-side row gets a deterministic salt in ``[0, num_salts)``
    hashed from the whole row (so a hot key's rows spread across salts);
    the small side is exploded ×``num_salts`` so every (key, salt)
    combination finds its match. Supports the join types where
    small-side replication is sound (inner / left semi — the small side
    must not produce unmatched-row output, which replication would
    duplicate).
    """
    if how not in ("inner", "left_semi", "leftsemi"):
        raise ValueError(f"salted_join supports inner/left_semi, got {how!r}")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(num_salts))
    b = big.withColumn("_salt", salt)
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)).cast("array<long>"))
    )
    return b.join(s, on=on + ["_salt"], how=how).drop("_salt")
