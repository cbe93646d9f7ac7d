"""B3/B4/B9/B10 — HTML extraction stage vs the reference's selector
logic (/root/reference/src/crwling.py:136-199, :71-87, :23-32)."""

from neo4j_graphdb_spark.sources.html_extract import (
    extract_articles,
    extract_content,
    paginated_param_table,
    parse_html,
    quarantine_split,
    write_quarantine,
    _candidates,
    _extract_one,
)

SERP = """
<html><body><div id="search">
  <div data-ved="v1">
    <a href="https://news.example.com/a1">
      <div role="heading">First article headline</div>
    </a>
    <span>Example Times</span>
  </div>
  <div data-ved="v2">
    <a href="https://www.google.com/internal">ignored</a>
  </div>
  <div data-ved="v3">
    <a href="https://news.example.com/a3"><div>tiny</div></a>
  </div>
  <div data-ved="v4">
    <a href="https://news.example.com/a4"><span>Fallback title via span</span></a>
  </div>
</div></body></html>
"""

RSO_FALLBACK = """
<html><body><div id="rso">
  <div>
    <a href="https://news.example.com/b1"><h3 role="heading">Fallback page headline</h3></a>
    <span>Rso Press</span>
  </div>
</div></body></html>
"""

DETAIL = """
<html><body>
  <div id="wrap"><div id="dic_area">Body <b>first</b> paragraph.
  second\tline</div></div>
</body></html>
"""

DETAIL_FALLBACK = """
<html><body><div class="se-main-container x">blog body text</div></body></html>
"""


def test_candidate_and_field_extraction():
    root = parse_html(SERP)
    arts = _candidates(root)
    assert len(arts) == 4  # every div[data-ved]
    recs = [_extract_one(a) for a in arts]
    # v1: full extraction; v2: google link skipped; v3: short title
    # skipped; v4: span-fallback title, no span outside link → the link
    # span doubles as publisher source
    assert recs[0] == {
        "title": "First article headline",
        "link": "https://news.example.com/a1",
        "publisher": "Example Times",
    }
    assert recs[1] is None
    assert recs[2] is None
    assert recs[3]["title"] == "Fallback title via span"


def test_rso_fallback_selector():
    root = parse_html(RSO_FALLBACK)
    arts = _candidates(root)
    assert len(arts) == 1
    rec = _extract_one(arts[0])
    assert rec["title"] == "Fallback page headline"
    assert rec["publisher"] == "Rso Press"


def test_extract_articles_stage(spark):
    df = spark.createDataFrame(
        [("p1", SERP), ("p2", RSO_FALLBACK)], "page_id string, html string"
    )
    out = extract_articles(df).collect()
    good = [r for r in out if r["_error"] is None]
    assert {r["title"] for r in good} == {
        "First article headline",
        "Fallback title via span",
        "Fallback page headline",
    }
    assert all(r["_error"] is None for r in out)


def test_error_isolation_and_quarantine(spark, tmp_path):
    df = spark.createDataFrame(
        [("ok", SERP), ("bad", None)], "page_id string, html string"
    )
    out = extract_articles(df)
    good, bad = quarantine_split(out)
    # None html parses to an empty document → zero candidates, no error;
    # force a page-level error with a non-string payload instead
    assert bad.count() == 0

    # force a page-level failure by feeding bytes (parser raises)
    df2 = spark.createDataFrame([("x", b"\xff\xfe")], "page_id string, html binary")
    out2 = extract_articles(df2)
    good2, bad2 = quarantine_split(out2)
    assert good2.count() == 0
    assert bad2.count() == 1
    assert bad2.collect()[0]["_error"] is not None
    qpath = write_quarantine(bad2, str(tmp_path))
    q = spark.read.parquet(qpath)
    assert q.count() == 1
    assert "_quarantined_at" in q.columns


def test_detail_content_selectors(spark):
    df = spark.createDataFrame(
        [("d1", DETAIL), ("d2", DETAIL_FALLBACK), ("d3", "<html><body>nothing</body></html>")],
        "id string, detail_html string",
    )
    rows = {r["id"]: r["content"] for r in extract_content(df).collect()}
    # clean_text applied: tags stripped, \t→space, trimmed
    assert rows["d1"] == "Body first paragraph. second line"
    assert rows["d2"] == "blog body text"
    assert rows["d3"] == ""


def test_paginated_param_table(spark):
    t = paginated_param_table(spark, "연예", 3).collect()
    assert [r["start"] for r in t] == [1, 11, 21]
    assert all(r["keyword"] == "연예" for r in t)


def test_end_to_end_into_graph(spark, tmp_path):
    """Golden E1 slice: SERP HTML → extract → filter/impute → MERGE —
    the reference's crawl loop as one batched pipeline."""
    from neo4j_graphdb_spark.functions.text import impute_publisher, ingest_filter
    from neo4j_graphdb_spark.operators.cypher import Graph
    from neo4j_graphdb_spark.writer import GraphStore

    df = spark.createDataFrame([("p1", SERP)], "page_id string, html string")
    good, _bad = quarantine_split(extract_articles(df))
    recs = ingest_filter(good).select(
        "link", "title", impute_publisher("publisher").alias("publisher")
    )
    store = GraphStore(spark, str(tmp_path / "g"))
    store.merge_nodes(recs, label="Article", key_col="link", prop_cols=["title"])
    store.merge_nodes(
        recs.select("publisher").distinct(), label="Publisher", key_col="publisher"
    )
    store.merge_edges(
        recs.select("link", "publisher"),
        "WRITTEN_BY", "Article", "link", "Publisher", "publisher",
    )
    g = Graph(store.nodes(), store.edges())
    triples = g.expand(rel_type="WRITTEN_BY", src_label="Article", dst_label="Publisher")
    pairs = {(r["a_key"], r["b_key"]) for r in triples.collect()}
    assert ("https://news.example.com/a1", "Example Times") in pairs


def test_status_policy_abort_and_skip(spark):
    """B2: 429 aborts (pages at/after the first 429 drop, reference
    `break`), other non-200s skip, 200s survive (src/crwling.py:119-125)."""
    from neo4j_graphdb_spark.sources.html_extract import apply_status_policy

    rows = [(1, 200), (2, 503), (3, 200), (4, 429), (5, 200), (6, 429), (7, 200)]
    df = spark.createDataFrame(rows, "page_num int, status int")
    kept = sorted(r["page_num"] for r in apply_status_policy(df).collect())
    assert kept == [1, 3]  # 2 skipped (503), 4+ aborted

    # no 429 anywhere: only the non-200 skip applies
    df2 = spark.createDataFrame([(1, 200), (2, 404), (3, 200)], "page_num int, status int")
    kept2 = sorted(r["page_num"] for r in apply_status_policy(df2).collect())
    assert kept2 == [1, 3]

    # 429 on the very first page: nothing survives
    df3 = spark.createDataFrame([(1, 429), (2, 200)], "page_num int, status int")
    assert apply_status_policy(df3).count() == 0
