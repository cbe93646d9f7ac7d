"""JSON property access (tier C12) — the schema-free ``props`` bag.

The reference's graph is schema-free (SURVEY.md §1.1); our ``events.props``
fixture column carries JSON strings. Access compiles to Catalyst's native
JSON expressions (pushdown-friendly, no UDF).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def json_get(col: Column | str, key: str) -> Column:
    """Extract a scalar property: ``props ->> '$.key'`` (string result)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.get_json_object(c, f"$.{key}")


def json_get_int(col: Column | str, key: str) -> Column:
    return json_get(col, key).cast("bigint")


def json_parse(col: Column | str, schema: T.StructType | str) -> Column:
    """Parse the whole bag into a typed struct (``from_json``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.from_json(c, schema)
