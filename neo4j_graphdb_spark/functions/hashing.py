"""The engine's cross-checkable hash primitives.

One definition of the md5-fold used by every deterministic gate
(train/val/test split, stratified sampling, global shuffle): fold the
first 15 hex digits of ``md5(salt || key)`` to a non-negative integer.
DuckDB computes the identical value digit-for-digit
(``list_reduce(list_transform(split(substr(md5(x),1,15),''), …))`` —
see ``registry._MD5_60_SQL``), which is what makes every hash-gated
operator SQL-auditable. 15 hex digits < 2^60 keeps the fold inside a
signed 64-bit integer on both engines, so ``%`` and ``pmod`` agree.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_hex(key: Column | str, salt: str) -> Column:
    """``md5(salt || key)`` as the 32-char hex string (an order key —
    hex sorts identically everywhere)."""
    c = F.col(key) if isinstance(key, str) else key
    return F.md5(F.concat(F.lit(salt), c.cast("string")))


def md5_bucket(key: Column | str, salt: str, slots: int) -> Column:
    """Fold ``md5(salt || key)`` into a bucket in ``[0, slots)``."""
    return F.pmod(
        F.conv(F.substring(md5_hex(key, salt), 1, 15), 16, 10).cast("long"),
        F.lit(slots),
    )
