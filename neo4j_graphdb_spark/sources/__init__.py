from neo4j_graphdb_spark.sources.fixtures import (
    article_publisher_tables,
    analytics_graph,
    load,
)

__all__ = ["article_publisher_tables", "analytics_graph", "load"]
