"""Fixture sources: deterministic graphs derived from the driver tables.

FIXTURES.md defines two graphs rebuilt from the read-only Parquet fixtures
so graph-operator tests need no crawling:

* **Article/Publisher graph** — the reference's crawl data model
  (``/root/reference/src/crwling.py:165-170`` record dict → ``MERGE``
  statements ``:47-56``): from ``documents``,
  ``Article{link='doc://'||doc_id, title=substr(text,1,40), content=text}``,
  ``Publisher{name=source}``, ``(Article)-[:WRITTEN_BY]->(Publisher)``.
* **Analytics graph** — Customer/Supplier/Nation/Region/Part nodes with
  FROM/IN/BOUGHT edges, for the tier-C algorithms (PageRank, CC, BFS…).

All derivations are pure column expressions, so node ids (xxhash64 of
label+key) are bit-stable across rebuilds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from neo4j_graphdb_spark.model import as_edges, as_nodes


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def article_publisher_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """The crawl-record table reshaped to the reference's dict shape
    ``{'title','link','publisher','content'}`` (``src/crwling.py:165-170``)."""
    docs = load(spark, sf_dir, "documents")
    records = docs.select(
        F.concat(F.lit("doc://"), F.col("doc_id")).alias("link"),
        F.substring(F.col("text"), 1, 40).alias("title"),
        F.col("text").alias("content"),
        F.col("source").alias("publisher"),
    )
    return {"records": records}


def article_publisher_graph(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Canonical nodes/edges for the Article/Publisher graph (no store)."""
    records = article_publisher_tables(spark, sf_dir)["records"]
    articles = as_nodes(records, "Article", "link", ["title", "content"])
    publishers = as_nodes(
        records.select("publisher").distinct().withColumnRenamed("publisher", "name"),
        "Publisher",
        "name",
        ["name"],
    )
    written_by = as_edges(records, "WRITTEN_BY", "Article", "link", "Publisher", "publisher")
    return {"articles": articles, "publishers": publishers, "written_by": written_by}


def analytics_graph(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Multi-component directed graph over the TPC-H-ish fixtures.

    Edges: (Customer)-[:FROM]->(Nation), (Supplier)-[:FROM]->(Nation),
    (Nation)-[:IN]->(Region), (Customer)-[:BOUGHT]->(Part) via
    orders ⋈ lineitem. Keys are the natural business keys, prefixed with
    the label so ids never collide across labels.
    """
    customer = load(spark, sf_dir, "customer")
    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    part = load(spark, sf_dir, "part")

    nodes = (
        as_nodes(customer.select(F.col("c_custkey").alias("k"), F.col("c_name").alias("name")), "Customer", "k", ["name"])
        .unionByName(as_nodes(supplier.select(F.col("s_suppkey").alias("k"), F.col("s_name").alias("name")), "Supplier", "k", ["name"]))
        .unionByName(as_nodes(nation.select(F.col("n_nationkey").alias("k"), F.col("n_name").alias("name")), "Nation", "k", ["name"]))
        .unionByName(as_nodes(region.select(F.col("r_regionkey").alias("k"), F.col("r_name").alias("name")), "Region", "k", ["name"]))
        .unionByName(as_nodes(part.select(F.col("p_partkey").alias("k"), F.col("p_name").alias("name")), "Part", "k", ["name"]))
    )

    cust_from = as_edges(
        customer.select(F.col("c_custkey").alias("s"), F.col("c_nationkey").alias("d")),
        "FROM", "Customer", "s", "Nation", "d",
    )
    supp_from = as_edges(
        supplier.select(F.col("s_suppkey").alias("s"), F.col("s_nationkey").alias("d")),
        "FROM", "Supplier", "s", "Nation", "d",
    )
    nation_in = as_edges(
        nation.select(F.col("n_nationkey").alias("s"), F.col("n_regionkey").alias("d")),
        "IN", "Nation", "s", "Region", "d",
    )
    edges = cust_from.unionByName(supp_from).unionByName(nation_in)
    return {"nodes": nodes, "edges": edges}
