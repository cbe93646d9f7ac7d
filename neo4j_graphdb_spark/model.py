"""Canonical property-graph data model (SURVEY.md §1.3).

The reference's implicit model (four node labels ``Article Publisher User
Tech`` keyed by one merge property, two edge types ``WRITTEN_BY
INTERESTED_IN`` — ``/root/reference/src/crwling.py:47-56``,
``/root/reference/src/ingest.py:4-8``) maps to two canonical columnar
DataFrames:

``nodes(node_id long, label string, key string, props map<string,string>)``
``edges(src long, dst long, rel_type string, props map<string,string>)``

plus per-label *typed views* carrying real Catalyst column types.

Node identity is **content-derived**: ``node_id = xxhash64(label, key)``.
This is the key departure from Neo4j's mutable id counter — a deterministic
id makes MERGE (upsert-by-key, ``src/crwling.py:48``) a pure dedup/union
with no id-allocation coordination, which is what makes the write path safe
on a 1000-executor cluster: any executor can compute the id of any node
without talking to anyone.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

NODE_ID = "node_id"

# secondary labels live in this node prop column: a SORTED, ','-joined,
# duplicate-free set excluding the primary (a plain string prop, so it
# rides merge_nodes, REMOVE, schema evolution and time travel
# unchanged). The storage label stays the node's PRIMARY (creation)
# label and keeps its partition pruning; `SET n:Extra` / `REMOVE
# n:Extra` edit this set, and the (n:A:B) conjunction scan + labels(n)
# read the union.
EXTRA_LABELS = "_labels"

NODES_SCHEMA = T.StructType(
    [
        T.StructField("node_id", T.LongType(), False),
        T.StructField("label", T.StringType(), False),
        T.StructField("key", T.StringType(), False),
        T.StructField("props", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

EDGES_SCHEMA = T.StructType(
    [
        T.StructField("src", T.LongType(), False),
        T.StructField("dst", T.LongType(), False),
        T.StructField("rel_type", T.StringType(), False),
        T.StructField("props", T.MapType(T.StringType(), T.StringType()), True),
    ]
)


def node_id_expr(label: Column | str, key: Column | str) -> Column:
    """Deterministic 64-bit node id from (label, merge-key).

    ``xxhash64`` runs JVM-side inside whole-stage codegen; collisions over
    two short strings are ~2^-64 per pair — acceptable for analytic graphs
    (and vastly safer than the reference's reliance on Neo4j's per-store
    id counter when data is rebuilt).

    The key is hashed as a STRING — the same representation the canonical
    ``nodes.key`` column stores — so *every* path that mints an id (MERGE
    via :func:`as_nodes`, CREATE ordinals in ``writer.create_nodes``,
    edge endpoints via :func:`as_edges`, and any re-derivation from a
    stored ``key``) agrees regardless of the caller's source column type.
    xxhash64 hashes a long and its decimal string differently, so without
    this normalization a CREATE over a bigint key would mint ids that
    MERGE/as_edges (fed the raw long) could never find.
    """
    label_c = F.lit(label) if isinstance(label, str) else label
    key_c = F.col(key) if isinstance(key, str) else key
    return F.xxhash64(label_c, key_c.cast("string"))


def as_nodes(df: DataFrame, label: str, key_col: str, prop_cols: list[str] | None = None) -> DataFrame:
    """Project an arbitrary DataFrame into the canonical nodes shape.

    Typed property columns are preserved *alongside* the canonical columns
    (the schema-free ``props`` overflow bag stays available for ad-hoc
    properties, mirroring Neo4j's schema-optional flavor).
    """
    prop_cols = prop_cols or []
    cols = [
        node_id_expr(label, key_col).alias(NODE_ID),
        F.lit(label).alias("label"),
        F.col(key_col).cast("string").alias("key"),
    ] + [F.col(c) for c in prop_cols]
    return df.select(*cols)


def as_edges(
    df: DataFrame,
    rel_type: str,
    src_label: str,
    src_key_col: str,
    dst_label: str,
    dst_key_col: str,
    prop_cols: list[str] | None = None,
) -> DataFrame:
    """Project a DataFrame of (src_key, dst_key) pairs into canonical
    edges, carrying any typed relationship-property columns alongside
    (the edge twin of :func:`as_nodes`'s prop passthrough)."""
    return df.select(
        node_id_expr(src_label, src_key_col).alias("src"),
        node_id_expr(dst_label, dst_key_col).alias("dst"),
        F.lit(rel_type).alias("rel_type"),
        *[F.col(c) for c in (prop_cols or [])],
    )


def node_struct(df: DataFrame, alias: str) -> Column:
    """Whole-entity projection (A5): return a node row as one struct value.

    Mirrors ``RETURN u, r, t`` (``/root/reference/cypher.txt:4-5``) and
    ``RETURN a`` (``src/crwling.py:55``): a result column holding an entire
    node/edge. Field order is the DataFrame's column order, which our
    builders keep canonical so hashes are stable.
    """
    return F.struct(*[F.col(c) for c in df.columns]).alias(alias)
