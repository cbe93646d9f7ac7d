"""Data-layout operators: multi-dimensional clustering for scan pruning.

At 100 TB the scan you avoid is worth more than the join you optimize:
parquet row-group (and file-level) min/max statistics prune only when
rows with nearby values sit in the same files. Sorting by ONE column
clusters that column and destroys the others; a Z-ORDER (Morton) key
interleaves the bits of several columns so every interleaved dimension
keeps locality — the same technique Delta Lake's ``OPTIMIZE ZORDER BY``
and ClickHouse/Hudi space-filling-curve clustering apply before writing.

Everything here is exact integer/bit arithmetic over a deterministic
min-max grid: no sampling, no RNG, so the layout (and the registry
oracle) is reproducible bit-for-bit on any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
) -> DataFrame:
    """Append a Morton/Z-order key column ``zvalue`` interleaving the
    bit patterns of ``cols``.

    Each column is quantized onto a ``2**bits`` grid between its global
    min and max (one tiny aggregate, broadcast to the scan — the only
    extra pass), then bit ``b`` of dimension ``i`` lands at position
    ``b*len(cols) + i`` of the key. ``repartitionByRange`` +
    ``sortWithinPartitions`` on ``zvalue`` before a write gives every
    written file a tight min/max envelope in ALL interleaved dimensions.

    Exactness: min/max are exact aggregates, the grid index is one IEEE
    expression (``floor((x-min)/(max-min) * 2^bits)``, clamped), and the
    interleave is integer shifts — identical on any engine, so layouts
    are reproducible. ``bits * len(cols)`` must fit a long (≤ 63).
    """
    if not cols:
        raise ValueError("zorder_key needs at least one column")
    if bits * len(cols) > 63:
        raise ValueError(
            f"{bits} bits x {len(cols)} dims exceeds a 63-bit key"
        )
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"_min_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"_max_{c}") for c in cols],
    )
    with_stats = df.crossJoin(F.broadcast(stats))
    n_levels = F.lit(float(2**bits))
    qcols = []
    for c in cols:
        span = F.col(f"_max_{c}") - F.col(f"_min_{c}")
        raw = F.when(span > 0,
                     F.floor(
                         (F.col(c).cast("double") - F.col(f"_min_{c}"))
                         / span * n_levels
                     )).otherwise(F.lit(0))
        qcols.append(
            F.least(raw, F.lit(2**bits - 1)).cast("long").alias(f"_q_{c}")
        )
    quantized = with_stats.select(
        *df.columns, *qcols
    )
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(F.col(f"_q_{c}"), b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(
                F.shiftleft(bit.cast("long"), b * len(cols) + i)
            )
    return quantized.select(*df.columns, z.alias("zvalue"))


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    num_files: int = 16,
) -> DataFrame:
    """Cluster ``df`` for writing: Z-order key, range-partition into
    ``num_files`` splits on it, sort within each — the exact shape of
    Delta's OPTIMIZE ZORDER pass. The result writes one tight-enveloped
    file per partition; parquet min/max stats then prune range queries
    on ANY prefix-interleaved dimension."""
    keyed = zorder_key(df, cols, bits)
    return keyed.repartitionByRange(num_files, "zvalue").sortWithinPartitions(
        "zvalue"
    )
