"""neo4j_graphdb_spark — a PySpark-native property-graph analytics engine.

Re-expresses the query + data-processing capabilities of the reference
``beomzh/neo4j_GraphDB`` (a Neo4j-backed crawl/ingest app; see SURVEY.md)
as an idiomatic Spark engine:

* canonical columnar ``nodes`` / ``edges`` DataFrames (``model``),
* batch MERGE-upsert write path with write counters (``writer``),
* a Cypher-subset builder API — scan / expand / project / limit
  (``operators.cypher``),
* Pregel-on-DataFrames graph analytics: PageRank, connected components,
  BFS, triangle count, label propagation (``graph``),
* LLM-data-pipeline operators: exact/MinHash/SimHash dedup, n-gram
  Jaccard, cosine top-k similarity, text analysis, multimodal column
  plumbing (``operators``),
* Structured Streaming ingest + windowed aggregation (``streaming``).

Everything compiles to stock DataFrame operators so Catalyst/Tungsten
(predicate pushdown, broadcast joins, AQE, whole-stage codegen) does the
physical planning — no RDDs, no custom Catalyst rules.
"""

from neo4j_graphdb_spark.session import get_spark
from neo4j_graphdb_spark.model import NODE_ID, node_id_expr
from neo4j_graphdb_spark.writer import GraphStore, WriteSummary

__all__ = ["get_spark", "NODE_ID", "node_id_expr", "GraphStore", "WriteSummary"]

__version__ = "0.1.0"
