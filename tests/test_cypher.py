"""Tier-A read-path tests: the five reference Cypher statements as API
calls (FIXTURES.md golden end-to-end), over a fixture-built graph.
"""

import pytest
from pyspark.sql import functions as F

from neo4j_graphdb_spark.operators.cypher import Graph, bind_params
from neo4j_graphdb_spark.sources.fixtures import article_publisher_graph


@pytest.fixture(scope="module")
def graph(spark, sf_dir):
    g = article_publisher_graph(spark, sf_dir)
    nodes = g["articles"].unionByName(g["publishers"], allowMissingColumns=True)
    return Graph(nodes, g["written_by"])


def test_a1_label_scan(graph):
    # MATCH (a:Article) RETURN a.title AS title LIMIT 5   (main.py:17)
    out = graph.match("Article").select(F.col("title").alias("title")).limit(5)
    rows = out.collect()
    assert len(rows) == 5
    assert out.columns == ["title"]


def test_a2_all_nodes_scan_limit(graph):
    # MATCH (n) RETURN n LIMIT 25   (cypher.txt:8)
    assert graph.match().limit(25).count() == 25


def test_a3_expand(graph):
    # MATCH (u:User)-[r:INTERESTED_IN]->(t:Tech) RETURN u, r, t  (cypher.txt:4-5)
    # same operator over the Article/Publisher graph
    triples = graph.expand("WRITTEN_BY", "Article", "Publisher", "a", "p")
    assert triples.count() == graph.edges_df.count()
    row = triples.select("a_key", "rel_type", "p_key").first()
    assert row["rel_type"] == "WRITTEN_BY"
    assert row["a_key"].startswith("doc://")


def test_a5_whole_entity(graph):
    arts = graph.match("Article")
    out = arts.select(graph.entity(arts, "a")).limit(3).collect()
    assert all(r["a"]["label"] == "Article" for r in out)
    assert all(r["a"]["title"] is not None for r in out)


def test_a11_params(graph):
    # session.run(query, name=..., tech=...) analogue
    p = bind_params({"label": "Article"})
    out = graph.nodes_df.filter(F.col("label") == p["label"])
    assert out.count() == graph.match("Article").count()


def test_a12_datetime(spark):
    # datetime() → current_timestamp  (src/crwling.py:51)
    row = spark.range(1).select(F.current_timestamp().alias("t")).first()
    assert row["t"] is not None


def test_label_scan_pushdown(graph):
    """The label predicate must reach the scan (SURVEY.md §4)."""
    plan = graph.match("Article")._jdf.queryExecution().executedPlan().toString()
    assert "label" in plan


def test_expand_optional_keeps_unmatched_sources(spark):
    from neo4j_graphdb_spark.model import as_edges, as_nodes
    from neo4j_graphdb_spark.operators.cypher import Graph

    n = spark.createDataFrame([("a1",), ("a2",)], "k string")
    p = spark.createDataFrame([("p1",)], "k string")
    e = spark.createDataFrame([("a1", "p1")], "s string, d string")
    g = Graph(
        as_nodes(n, "Article", "k").unionByName(as_nodes(p, "Publisher", "k")),
        as_edges(e, "WRITTEN_BY", "Article", "s", "Publisher", "d"),
    )
    out = {r["a_key"]: r["b_key"] for r in
           g.expand_optional(rel_type="WRITTEN_BY", src_label="Article",
                             dst_label="Publisher").collect()}
    assert out == {"a1": "p1", "a2": None}


def test_expand_var_path_rows_and_bounds(spark):
    from neo4j_graphdb_spark.model import as_edges, as_nodes
    from neo4j_graphdb_spark.operators.cypher import Graph

    # chain a -> b -> c
    nodes = spark.createDataFrame([("a",), ("b",), ("c",)], "k string")
    ab = spark.createDataFrame([("a", "b"), ("b", "c")], "s string, d string")
    g = Graph(
        as_nodes(nodes, "N", "k"),
        as_edges(ab, "R", "N", "s", "N", "d"),
    )
    rows = {(r["a_key"], r["b_key"], r["hops"]) for r in
            g.expand_var(min_hops=1, max_hops=2).collect()}
    assert rows == {("a", "b", 1), ("b", "c", 1), ("a", "c", 2)}

    # min_hops=0 (r16): the zero-length path — each node reaches
    # itself at hop 0, union'd with the 1..max ladder
    rows0 = {(r["a_key"], r["b_key"], r["hops"]) for r in
             g.expand_var(min_hops=0, max_hops=1).collect()}
    assert rows0 == {
        ("a", "a", 0), ("b", "b", 0), ("c", "c", 0),
        ("a", "b", 1), ("b", "c", 1),
    }

    import pytest as _p
    with _p.raises(ValueError):
        g.expand_var(min_hops=-1)
    with _p.raises(ValueError):
        g.expand_var(min_hops=2, max_hops=1)


def test_graph_key_names_opt_in_resolution(spark, tmp_path):
    """Opt-in key-name materialization: a Graph built with the store's
    key_names() sidecar resolves `p.<keyname>` Neo4j-exactly on
    single-label scans — including under the cross-label prop-column
    COLLISION (another label wrote a prop of that name) and after an
    explicit SET on the colliding name. Default Graphs are unchanged."""
    from pyspark.sql import functions as F

    from neo4j_graphdb_spark.operators.cypher import Graph
    from neo4j_graphdb_spark.operators.cypher_text import run_cypher
    from neo4j_graphdb_spark.writer import GraphStore

    s = GraphStore(spark, str(tmp_path / "gs"))
    batch = spark.createDataFrame(
        [("u1", "P1"), ("u2", "P2")], "link string, publisher string"
    )
    # Article CLAIMS a `publisher` prop column -> collision with the
    # Publisher label's merge-key name
    s.merge_nodes(batch, label="Article", key_col="link", prop_cols=["publisher"])
    s.merge_nodes(
        batch.select("publisher").distinct(), label="Publisher",
        key_col="publisher",
    )

    g_plain = Graph(s.nodes(), s.edges())
    g_keyed = Graph(s.nodes(), s.edges(), key_names=s.key_names())

    q = "MATCH (p:Publisher) RETURN p.publisher AS pub"
    # historical resolution: the colliding prop column, NULL for Publisher
    assert [r["pub"] for r in run_cypher(spark, q, graph=g_plain).df.collect()] == [
        None, None,
    ]
    # keyed resolution: the merge key under its user-facing name
    assert sorted(
        r["pub"] for r in run_cypher(spark, q, graph=g_keyed).df.collect()
    ) == ["P1", "P2"]
    # no-collision labels resolve identically either way
    q2 = "MATCH (a:Article) RETURN a.link AS l"
    for g in (g_plain, g_keyed):
        assert sorted(
            r["l"] for r in run_cypher(spark, q2, graph=g).df.collect()
        ) == ["u1", "u2"]
    # an explicitly-SET cell on the colliding name wins over the key
    enriched = g_keyed.match("Publisher")
    assert dict(
        enriched.select("key", "publisher").collect()
    ) == {"P1": "P1", "P2": "P2"}
    forced = Graph(
        s.nodes().withColumn(
            "publisher",
            F.when(F.col("label") == "Publisher", F.lit("X")).otherwise(
                F.col("publisher")
            ),
        ),
        None,
        key_names=s.key_names(),
    )
    assert {r["publisher"] for r in forced.match("Publisher").collect()} == {"X"}
