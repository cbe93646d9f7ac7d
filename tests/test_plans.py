"""Physical-plan shape assertions — the 100 TB checklist made executable.

These don't check answers (the oracles do); they check that the plans are
the ones you'd want on a 1000-executor cluster: filters and projections
reaching the Parquet scan, small dimensions broadcast, label scans
partition-pruned in the store.
"""

import tempfile

from pyspark.sql import functions as F

from neo4j_graphdb_spark.registry import QUERIES
from neo4j_graphdb_spark.writer import GraphStore


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_scan_prunes_columns(spark, sf_dir):
    """rel_pricing_summary touches 5 of lineitem's 16 columns — the scan's
    ReadSchema must not include the untouched ones."""
    plan = _plan(QUERIES["rel_pricing_summary"](spark, sf_dir))
    scan = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_quantity" in scan
    assert "l_comment" not in scan and "l_shipdate" not in scan


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    """A typed event filter must appear in PushedFilters, not only as a
    post-scan Filter node."""
    from neo4j_graphdb_spark.session import load_table

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    plan = _plan(ev.select("event_id"))
    assert "PushedFilters" in plan and "event_type" in plan.split("PushedFilters", 1)[1]


def test_small_dimension_broadcasts(spark, sf_dir):
    """rel_top_customers joins lineitem→orders→customer; at least the
    customer side must be a broadcast hash join (no shuffle of the fact
    side for it)."""
    plan = _plan(QUERIES["rel_top_customers"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_bucketed_join_is_shuffle_free(spark, sf_dir):
    """With broadcast disabled (forcing the sort-merge path a 100 TB fact
    join takes), the bucketed tables' join must need NO shuffle exchange
    of either side — the only hash exchange left is the final agg's."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(QUERIES["rel_bucketed_join"](spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "SortMergeJoin" in plan
    join_part = plan.split("SortMergeJoin", 1)[1]
    # nothing below the join reshuffles: bucket layout satisfies the
    # join's distribution requirement on both sides
    assert "Exchange hashpartitioning" not in join_part
    assert plan.count("Exchange hashpartitioning") == 1  # the groupBy only


def test_store_label_scan_partition_prunes(spark, sf_dir):
    """GraphStore partitions nodes by label; a MATCH (:Article) must scan
    only that partition (PartitionFilters on label)."""
    from neo4j_graphdb_spark.operators.cypher import Graph
    from neo4j_graphdb_spark.registry import _article_source

    src = _article_source(spark, sf_dir)
    store = GraphStore(spark, tempfile.mkdtemp(prefix="gs_plan_"))
    store.merge_nodes(src, label="Article", key_col="link", prop_cols=["title"])
    store.merge_nodes(
        src.select("publisher").distinct(), label="Publisher", key_col="publisher"
    )
    g = Graph(store.nodes(), None)
    plan = _plan(g.match("Article"))
    pf = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "label" in pf


def test_contamination_benchmark_broadcasts(spark, sf_dir):
    """c20's benchmark shingle set is tiny relative to the corpus — it
    must reach every executor by broadcast, never by shuffling the
    exploded corpus grams on the join key."""
    plan = _plan(QUERIES["c20_contamination"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_stratified_sample_is_pure_filter(spark, sf_dir):
    """c21 must compile to a filter over the scan — zero exchanges; the
    md5 gate is a row-local predicate, so sampling 100 TB costs one
    read pass and no shuffle."""
    plan = _plan(QUERIES["c21_stratified_sample"](spark, sf_dir))
    assert "Exchange" not in plan


def test_seq_pack_single_shuffle_on_bucket(spark, sf_dir):
    """c22 shuffles exactly once — on the pack bucket key into the
    Arrow-batched applyInPandas; no second exchange after packing."""
    plan = _plan(QUERIES["c22_seq_pack"](spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "FlatMapGroupsInPandas" in plan


def test_market_share_broadcasts_dimension_chain(spark, sf_dir):
    """rel_market_share: supplier/nation/region must all arrive by
    broadcast — three BroadcastHashJoins; the fact tables shuffle only
    for the lineitem⋈orders key join."""
    plan = _plan(QUERIES["rel_market_share"](spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 3


def test_gap_fill_scans_raw_events_once(spark, sf_dir):
    """rel_gap_fill: the raw-event aggregation is checkpointed, so the
    span/grid branch and the fill join must NOT each re-scan the events
    parquet."""
    plan = _plan(QUERIES["rel_gap_fill"](spark, sf_dir))
    assert plan.count("events.parquet") <= 1


def test_correlated_subquery_decorrelates(spark, sf_dir):
    """rel_correlated_sub: Catalyst must rewrite the per-part scalar
    subquery into an aggregate-then-join — the executed plan carries a
    join against the pre-aggregated per-part averages and NO per-row
    subquery node."""
    plan = _plan(QUERIES["rel_correlated_sub"](spark, sf_dir))
    assert "Join" in plan  # agg-then-join shape
    assert "HashAggregate" in plan
    assert "ScalarSubquery" not in plan and "InSubquery" not in plan


def test_unwind_lookup_broadcasts(spark, sf_dir):
    """a22: the UNWIND id list must reach the store scan as a broadcast
    join, not a shuffle of the Article table."""
    plan = _plan(QUERIES["a22_text_unwind_lookup"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_bigram_lm_single_window_shuffle(spark, sf_dir):
    """c48: exactly one Window node (the per-document adjacency); the
    count tables attach as joins, not extra windows."""
    plan = _plan(QUERIES["c48_bigram_lm"](spark, sf_dir))
    assert plan.count("Window") >= 1
    # the adjacency window partitions by the document id
    assert "doc_id" in next(l for l in plan.splitlines() if "Window" in l)


def test_skyline_single_window_no_cartesian(spark, sf_dir):
    """The hierarchical skyline plan must contain the frontier windows
    and NO quadratic join (the oracle's NOT EXISTS shape would surface
    as a cartesian/nested-loop over part×part)."""
    plan = _plan(QUERIES["rel_skyline"](spark, sf_dir))
    assert "Window" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan  # frontier grid broadcasts


def test_skyline_grid_cummax_is_bucket_partitioned(spark, sf_dir):
    """Hierarchical frontier (frontier-of-frontiers): the grid cummax
    window must be PARTITIONED by the price bucket — the distinct-price
    grid is never globally sorted into one partition. The only
    single-partition exchange allowed is the ≤32-row bucket rollup."""
    plan = _plan(QUERIES["rel_skyline"](spark, sf_dir))
    assert "windowspecdefinition(_bkt" in plan
    assert plan.count("Exchange SinglePartition") <= 1


def test_pq_search_broadcasts_codebook(spark, sf_dir):
    """PQ encode + ADC scoring must hash-join against broadcast
    codebook/table sides — the corpus never shuffles for the join — and
    no cartesian product may appear anywhere."""
    plan = _plan(QUERIES["c66_pq_topk"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_bloom_probe_no_fact_shuffle_join(spark, sf_dir):
    """The Bloom probe is pure column arithmetic against a broadcast
    1-row filter: no hash-partitioned join exchange may touch the fact
    side (the only joins are broadcasts; the final count aggregations
    are single-row)."""
    from neo4j_graphdb_spark.operators.sketch import bloom_semi_join
    from neo4j_graphdb_spark.session import load_table

    cust = load_table(spark, sf_dir, "customer")
    dim = cust.filter(F.col("c_nationkey") == 7).select(
        F.col("c_custkey").alias("key")
    )
    orders = load_table(spark, sf_dir, "orders")
    plan = _plan(bloom_semi_join(orders, "o_custkey", dim, "key"))
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "CartesianProduct" not in plan


def test_node_similarity_degree_cap_semi_join_guard(spark, sf_dir):
    """The c37 entry ships with degree_cap=40: the capped edge frame must
    carry the guard as a broadcast LEFT ANTI join against the over-cap
    hot set BEFORE any wedge join sees the edges — the plan that bounds
    a viral neighbor's pair fan-out at cap² instead of deg², with no
    extra shuffle of the edge side (the hot list is small by
    construction at any scale)."""
    from neo4j_graphdb_spark.graph.algorithms import capped_distinct_edges
    from neo4j_graphdb_spark.session import load_table

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    cp = o.join(li, o["o_orderkey"] == li["l_orderkey"]).select(
        F.col("o_custkey").alias("src"), F.col("l_partkey").alias("dst")
    )
    plan = _plan(capped_distinct_edges(cp, degree_cap=40))
    assert "LeftAnti" in plan and "BroadcastHashJoin" in plan
    # and the guard genuinely filters when a dst exceeds the cap (tight
    # cap here — sf0.001's hottest part sits under 40; sf0.01+ exceed it)
    n_uncapped = capped_distinct_edges(cp, None).count()
    n_capped = capped_distinct_edges(cp, 5).count()
    assert n_capped < n_uncapped


def test_phash_near_dup_band_join_no_cartesian(spark, sf_dir):
    """c93: candidates must come from an equality band join (hash
    exchange on the band slice), never a cartesian; the verify stage is
    a plain projection over candidates."""
    plan = _plan(QUERIES["c93_phash_near_dup"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_louvain_sweep_no_cartesian(spark, sf_dir):
    """c94: every Louvain sweep is key-partitioned joins/aggregations —
    no cartesian anywhere in the final labeling plan."""
    plan = _plan(QUERIES["c94_louvain"](spark, sf_dir))
    assert "CartesianProduct" not in plan


def test_span_removal_no_cartesian_no_udf(spark, sf_dir):
    """c96: span hashing, duplicate detection, coverage and reassembly
    are all joins/aggregations on (doc, pos) or the span hash — no
    cartesian, no Python UDF stage anywhere."""
    plan = _plan(QUERIES["c96_span_removal"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Python" not in plan


def test_temperature_mixture_broadcast_rates(spark, sf_dir):
    """c97: the derived per-stratum rates are a strata-sized dimension —
    they must reach the corpus scan by broadcast, and the gate is a
    row-local hash filter (no corpus shuffle)."""
    plan = _plan(QUERIES["c97_temperature_mixture"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_levenshtein_segments_content_keyed_join(spark, sf_dir):
    """c105 (r12): candidates must come from an equality join on the
    verbatim segment gram (_seg) — a content key whose bucket sizes
    track true duplicate mass — never a cartesian or a join keyed only
    on a fixed-cardinality partition column like source (the r11 shape
    that degenerated to per-block all-pairs)."""
    plan = _plan(QUERIES["c105_levenshtein_near_dup"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "_seg" in plan  # join/exchange keyed by the segment gram
    assert "source" not in plan  # no partition-column crutch anywhere


def test_multi_hop_match_broadcast_chain(spark, sf_dir):
    """a94 (r12): a k-hop single MATCH pattern must compile to k hash
    joins with dimension sides broadcast — never a cartesian or a
    nested-loop join; at fixture scale all four joins (2 edge hops ×
    (edge ⋈ node)) broadcast."""
    plan = _plan(QUERIES["a94_text_multi_hop"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2


def test_mmr_rerank_single_shuffle_plan(spark, sf_dir):
    """c104 (r13): the greedy rounds unroll at EXPRESSION level, so the
    whole rerank is ONE job — exactly one shuffle Exchange (the window/
    groupBy on the query key, shared partitioning) plus the query-side
    BroadcastExchange; no pool×pool join, no cartesian, no repeated
    per-round stages (the r12 weak spot)."""
    plan = _plan(QUERIES["c104_mmr_rerank"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastExchange") == 1
    # total Exchanges = the one broadcast + exactly one shuffle
    shuffles = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert shuffles == 1, plan.count("Exchange")


def test_perplexity_filter_dimension_joins(spark, sf_dir):
    """c134 (r13): the bigram stream joins the vocabulary²-bounded
    probability table on (w1, w2) via hash joins — never a cartesian;
    the single BroadcastNestedLoopJoin is the 1-row (n1, n2, types)
    scalars frame crossing onto the type table (the repo-wide
    broadcast-a-1-row-aggregate pattern), and the count tables reach
    the stream by broadcast."""
    plan = _plan(QUERIES["c134_perplexity_filter"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1  # the scalars row
    assert plan.count("BroadcastHashJoin") >= 2
    assert "BroadcastExchange" in plan


def test_quality_classifier_pruned_scan_no_udf(spark, sf_dir):
    """c136: the gate is one pruned 2-column scan (doc_id, text) through
    JVM-side hashing — no Python UDF/Arrow stage anywhere, map-side
    partial aggregation before both exchanges."""
    plan = _plan(QUERIES["c136_quality_classifier"](spark, sf_dir))
    scan = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "doc_id" in scan and "text" in scan
    assert "lang" not in scan and "source" not in scan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "partial_sum" in plan


def test_optional_reverse_broadcast_no_cartesian(spark, sf_dir):
    """a104: the target-anchored OPTIONAL MATCH compiles to the same
    broadcast left-outer expand chain as the canonical orientation —
    no cartesian product, dimension sides broadcast."""
    plan = _plan(QUERIES["a104_text_optional_reverse"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_exists_count_subquery_edge_side_aggregation(spark, sf_dir):
    """a105: EXISTS{}/COUNT{} values aggregate on the EDGE side and
    left-join back — the main frame is never fanned out, no cartesian."""
    plan = _plan(QUERIES["a105_text_exists_count_subquery"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
