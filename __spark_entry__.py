"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementations live in :mod:`neo4j_graphdb_spark.registry` so bench.py
and pytest share them.
"""

from __future__ import annotations

import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY.md §7 vertical slice): build the
    Article/Publisher graph from sf0.001 ``documents`` through the real
    MERGE-upsert writer — twice, proving idempotence — then answer the
    reference's verification query ``MATCH (a:Article) RETURN a.title AS
    title LIMIT 5`` (/root/reference/main.py:17)."""
    from neo4j_graphdb_spark.operators.cypher import Graph
    from neo4j_graphdb_spark.registry import _article_source
    from neo4j_graphdb_spark.writer import GraphStore

    sf_dir = "/root/testdata/sf0.001"
    src = _article_source(spark, sf_dir)
    store = GraphStore(spark, tempfile.mkdtemp(prefix="gs_entry_"))
    for _ in range(2):  # MERGE idempotence (src/crwling.py:61-64 counters)
        store.merge_nodes(src, label="Article", key_col="link", prop_cols=["title", "content"])
        store.merge_nodes(
            src.select("publisher").distinct(), label="Publisher", key_col="publisher"
        )
        store.merge_edges(
            src.select("link", "publisher"),
            "WRITTEN_BY", "Article", "link", "Publisher", "publisher",
        )
    g = Graph(store.nodes(), store.edges())
    return g.match("Article").select(F.col("title").alias("title")).limit(5)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from neo4j_graphdb_spark.registry import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every SQL-expressible query — including the
    iterative ones (c2 pagerank and c6 label propagation unroll their
    fixed supersteps as chained CTEs), the deterministic approximate
    ones (c9 LSH ANN inlines its constant hyperplanes; c9 IVF seeds its
    centroids), the multimodal mapInPandas path (c11 — the stub kernel
    is a pure function the oracle recomputes), and md5-fold variants of
    MinHash/SimHash that verify the full pipelines value-for-value.
    EVERY declared entry has an oracle — none are rows-only."""
    from neo4j_graphdb_spark.registry import ORACLES

    return dict(ORACLES)
