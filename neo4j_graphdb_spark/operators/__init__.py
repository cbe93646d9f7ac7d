from neo4j_graphdb_spark.operators.cypher import Graph

__all__ = ["Graph"]
