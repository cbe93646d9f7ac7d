"""Tier C1-C6 graph algorithms on tiny graphs with known answers."""

import pytest
from pyspark.sql import functions as F

from neo4j_graphdb_spark.graph.algorithms import (
    connected_components,
    degrees,
    label_propagation,
    pagerank,
    shortest_paths,
    triangle_count,
)


@pytest.fixture(scope="module")
def toy(spark):
    """Two components: a 4-node directed cycle-with-chord {1,2,3,4} and
    an isolated edge {10,11}."""
    nodes = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 4, 10, 11]], "node_id bigint"
    )
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3), (10, 11)], "src bigint, dst bigint"
    )
    return nodes, edges


def test_degrees(spark, toy):
    _, edges = toy
    d = {r["id"]: (r["out_degree"], r["in_degree"], r["degree"]) for r in degrees(edges).collect()}
    assert d[1] == (2, 1, 3)  # out: 1->2, 1->3; in: 4->1
    assert d[2] == (1, 1, 2)
    assert d[10] == (1, 0, 1)
    assert d[11] == (0, 1, 1)


def test_pagerank_invariants(spark, toy):
    nodes, edges = toy
    pr = pagerank(nodes, edges, max_iter=15)
    ranks = {r["node_id"]: r["rank"] for r in pr.collect()}
    assert abs(sum(ranks.values()) - 1.0) < 1e-6  # rank mass conserved
    assert all(v > 0 for v in ranks.values())
    # 11 is a pure sink fed by 10; 10 only gets base+dangling mass
    assert ranks[11] > ranks[10]
    # 1 and 3 each have two in-edges; 2 and 4 have one
    assert ranks[3] > ranks[2]


def test_pagerank_star_closed_form(spark):
    """Hub-and-spoke: 3 leaves → hub. Closed form (d=0.85, N=4, dangling
    hub redistributes): verified against the standard iterative formula."""
    nodes = spark.createDataFrame([(i,) for i in range(4)], "node_id bigint")
    edges = spark.createDataFrame([(1, 0), (2, 0), (3, 0)], "src bigint, dst bigint")
    pr = {r["node_id"]: r["rank"] for r in pagerank(nodes, edges, max_iter=40).collect()}
    # leaves are symmetric; hub absorbs 3 leaf contributions
    assert abs(pr[1] - pr[2]) < 1e-9 and abs(pr[2] - pr[3]) < 1e-9
    assert pr[0] > 3 * pr[1] * 0.8
    assert abs(sum(pr.values()) - 1.0) < 1e-6


def test_connected_components(spark, toy):
    nodes, edges = toy
    comp = {r["id"]: r["comp"] for r in connected_components(nodes, edges).collect()}
    assert comp[1] == comp[2] == comp[3] == comp[4] == 1
    assert comp[10] == comp[11] == 10
    assert comp[1] != comp[10]


def test_connected_components_path_graph(spark):
    """Path 0-1-2-…-39: O(diameter) for flooding, O(log n) for star —
    star must solve it well inside log-n-ish rounds (max_iter=8 ≪ 39)."""
    n = 40
    nodes = spark.createDataFrame([(i,) for i in range(n)], "node_id bigint")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src bigint, dst bigint"
    )
    comp = {r["id"]: r["comp"] for r in connected_components(nodes, edges, max_iter=8).collect()}
    assert set(comp.values()) == {0}


def test_connected_components_star_vs_flooding(spark, toy):
    """Differential: both algorithms agree on every node."""
    nodes, edges = toy
    star = {r["id"]: r["comp"] for r in connected_components(nodes, edges, algorithm="star").collect()}
    flood = {
        r["id"]: r["comp"]
        for r in connected_components(nodes, edges, algorithm="min_propagation").collect()
    }
    assert star == flood


def test_bfs(spark, toy):
    _, edges = toy
    src = spark.createDataFrame([(1,)], "id bigint")
    dist = {r["id"]: r["dist"] for r in shortest_paths(edges, src, max_hops=5).collect()}
    assert dist == {1: 0, 2: 1, 3: 1, 4: 2}  # 1->3 chord shortens 3


def test_triangles(spark, toy):
    _, edges = toy
    # undirected triangles: {1,2,3} (1-2,2-3,1-3) and {1,3,4} (3-4,4-1,1-3)
    assert triangle_count(edges).collect()[0]["triangles"] == 2


def test_label_propagation_two_cliques(spark):
    """Two 4-cliques joined by one bridge edge — LPA must separate them."""
    c1, c2 = [0, 1, 2, 3], [10, 11, 12, 13]
    edges = [(a, b) for a in c1 for b in c1 if a < b] + [
        (a, b) for a in c2 for b in c2 if a < b
    ] + [(3, 10)]
    nodes = spark.createDataFrame([(i,) for i in c1 + c2], "node_id bigint")
    e = spark.createDataFrame(edges, "src bigint, dst bigint")
    lbl = {r["id"]: r["lbl"] for r in label_propagation(nodes, e, max_iter=5).collect()}
    assert len({lbl[i] for i in c1}) == 1
    assert len({lbl[i] for i in c2}) == 1
    assert lbl[0] != lbl[13]


def test_triangle_count_hub_graph(spark):
    """Skew fixture: a 200-leaf star owns no triangles; closing 3 leaf
    pairs adds exactly 3. Under the degree orientation the hub (highest
    order) owns zero wedges, so the self-join fan-out is bounded by leaf
    degrees — the id-ordered variant would generate C(200,2) wedges at
    the hub."""
    from neo4j_graphdb_spark.graph.algorithms import triangle_count

    hub_edges = [("hub", f"leaf{i}") for i in range(200)]
    closing = [("leaf0", "leaf1"), ("leaf2", "leaf3"), ("leaf4", "leaf5")]
    df = spark.createDataFrame(hub_edges + closing, "src string, dst string")
    assert triangle_count(df).collect()[0]["triangles"] == 3

    # star alone: zero
    star = spark.createDataFrame(hub_edges, "src string, dst string")
    assert triangle_count(star).collect()[0]["triangles"] == 0

    # duplicate + reversed edges collapse to the simple graph
    noisy = spark.createDataFrame(
        hub_edges + closing + [(b, a) for a, b in closing] + closing,
        "src string, dst string",
    )
    assert triangle_count(noisy).collect()[0]["triangles"] == 3


def test_k_core_peels_tail(spark):
    """A 5-clique (4-core) with a chain hanging off it: peeling removes
    the chain in degeneracy-depth rounds and keeps exactly the clique."""
    from neo4j_graphdb_spark.graph.algorithms import k_core

    clique = [(f"c{i}", f"c{j}") for i in range(5) for j in range(i + 1, 5)]
    chain = [("c0", "t1"), ("t1", "t2"), ("t2", "t3")]
    e = spark.createDataFrame(clique + chain, "src string, dst string")
    out = {r["id"]: r["degree"] for r in k_core(e, k=3).collect()}
    assert set(out) == {"c0", "c1", "c2", "c3", "c4"}
    # inside the surviving subgraph every clique node has degree 4
    assert all(d == 4 for d in out.values())
    # k above the clique degree empties the graph
    assert k_core(e, k=5).count() == 0


def test_k_core_forest_is_empty_for_k2(spark):
    from neo4j_graphdb_spark.graph.algorithms import k_core

    tree = [("r", "a"), ("r", "b"), ("a", "c"), ("a", "d")]
    e = spark.createDataFrame(tree, "src string, dst string")
    assert k_core(e, k=2).count() == 0


def test_weighted_shortest_paths_picks_cheaper_long_path(spark):
    """Diamond where the 2-edge path (1+1) beats the direct edge (5) —
    hop-count BFS would get this wrong; Bellman-Ford must not."""
    from neo4j_graphdb_spark.graph.algorithms import weighted_shortest_paths

    edges = [("s", "t", 5.0), ("s", "m", 1.0), ("m", "t", 1.0), ("t", "x", 2.0)]
    e = spark.createDataFrame(edges, "src string, dst string, weight double")
    src = spark.createDataFrame([("s",)], "id string")
    d = {r["id"]: r["dist"] for r in weighted_shortest_paths(e, src).collect()}
    assert d == {"s": 0.0, "m": 1.0, "t": 2.0, "x": 4.0}


def test_weighted_shortest_paths_multi_source_unreachable(spark):
    from neo4j_graphdb_spark.graph.algorithms import weighted_shortest_paths

    edges = [("a", "b", 3.0), ("c", "b", 1.0), ("z1", "z2", 1.0)]
    e = spark.createDataFrame(edges, "src string, dst string, weight double")
    src = spark.createDataFrame([("a",), ("c",)], "id string")
    d = {r["id"]: r["dist"] for r in weighted_shortest_paths(e, src).collect()}
    # b reachable from both sources -> min wins; z* never appear
    assert d == {"a": 0.0, "c": 0.0, "b": 1.0}


def test_weighted_shortest_paths_sub_nano_relaxation_propagates(spark):
    """Fixpoint detection must see relaxations below 1e-9: the 3-hop
    path to ``a`` beats the direct edge by only 1e-12, and that
    improvement must still propagate one more round to ``d``. A
    checksum that rounds dist to 9 decimals stops after the round that
    updates ``a`` (its change is invisible) and leaves ``d`` stale —
    the raw-double-bits hash keeps iterating to the true fixpoint."""
    from neo4j_graphdb_spark.graph.algorithms import weighted_shortest_paths

    eps = 1e-12
    edges = [
        ("s", "a", 1.0),
        ("s", "b", 0.4),
        ("b", "c", 0.3),
        ("c", "a", 0.3 - eps),
        ("a", "d", 1.0),
    ]
    e = spark.createDataFrame(edges, "src string, dst string, weight double")
    src = spark.createDataFrame([("s",)], "id string")
    d = {r["id"]: r["dist"] for r in weighted_shortest_paths(e, src).collect()}
    # accumulate in the same IEEE-754 order Bellman-Ford does
    exp_a = (0.4 + 0.3) + (0.3 - eps)
    assert exp_a < 1.0  # the 3-hop path really is (sub-1e-9) cheaper
    assert d["a"] == exp_a
    assert d["d"] == exp_a + 1.0  # the round AFTER the sub-1e-9 relaxation


def test_personalized_pagerank_concentrates_near_sources(spark):
    """PPR on a path a->b->c plus isolated z, restarting at {a}: all rank
    flows down the path (a > b > c), z gets exactly zero, and classic
    PageRank on the same graph gives z nonzero — the teleport vector is
    what's being tested."""
    from neo4j_graphdb_spark.graph.algorithms import pagerank, personalized_pagerank

    nodes = spark.createDataFrame([("a",), ("b",), ("c",), ("z",)], "node_id string")
    edges = spark.createDataFrame([("a", "b"), ("b", "c")], "src string, dst string")
    srcs = spark.createDataFrame([("a",)], "node_id string")

    ppr = {r["node_id"]: r["rank"] for r in personalized_pagerank(nodes, edges, srcs, max_iter=12).collect()}
    assert ppr["a"] > ppr["b"] > ppr["c"]
    assert ppr["z"] == 0.0
    # mass sums to ~1 (dangling c and z return their mass to a)
    assert abs(sum(ppr.values()) - 1.0) < 1e-6

    classic = {r["node_id"]: r["rank"] for r in pagerank(nodes, edges, max_iter=12).collect()}
    assert classic["z"] > 0.0

    import pytest as _p
    empty = spark.createDataFrame([], "node_id string")
    with _p.raises(ValueError):
        personalized_pagerank(nodes, edges, empty)


def test_hits_star_closed_form(spark):
    """One hub pointing at 3 authorities converges in one step: hub score
    1 at the center (sole non-zero hub), auth 1/sqrt(3) per leaf."""
    from neo4j_graphdb_spark.graph.algorithms import hits

    nodes = spark.createDataFrame([(i,) for i in range(4)], "node_id bigint")
    edges = spark.createDataFrame([(0, 1), (0, 2), (0, 3)], "src bigint, dst bigint")
    hs = {r["node_id"]: r for r in hits(nodes, edges, max_iter=3).collect()}
    assert hs[0]["hub"] == pytest.approx(1.0)
    assert hs[0]["auth"] == pytest.approx(0.0)
    for leaf in (1, 2, 3):
        assert hs[leaf]["auth"] == pytest.approx(3 ** -0.5)
        assert hs[leaf]["hub"] == pytest.approx(0.0)


def test_hits_bipartite_degree_order(spark):
    """Two hubs with different fanout over shared authorities: the hub
    covering more authorities scores higher, and the authority covered by
    both hubs outranks single-hub ones; L2 norms stay 1."""
    from neo4j_graphdb_spark.graph.algorithms import hits

    nodes = spark.createDataFrame([(i,) for i in range(6)], "node_id bigint")
    # hub 0 -> {2,3,4}, hub 1 -> {4,5}; authority 4 is shared
    edges = spark.createDataFrame(
        [(0, 2), (0, 3), (0, 4), (1, 4), (1, 5)], "src bigint, dst bigint"
    )
    hs = {r["node_id"]: r for r in hits(nodes, edges, max_iter=12).collect()}
    assert hs[0]["hub"] > hs[1]["hub"] > 0
    assert hs[4]["auth"] > hs[2]["auth"] > 0
    assert sum(r["hub"] ** 2 for r in hs.values()) == pytest.approx(1.0)
    assert sum(r["auth"] ** 2 for r in hs.values()) == pytest.approx(1.0)


def test_node_similarity_hand_checked(spark):
    """Three owners over four items with known Jaccards: a={1,2,3},
    b={2,3,4}, c={4}. jac(a,b)=2/4, jac(b,c)=1/3, jac(a,c)=0 (never a
    candidate pair — no shared item, so the pair must not appear)."""
    from neo4j_graphdb_spark.graph.algorithms import node_similarity

    e = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", 3), ("b", 2), ("b", 3), ("b", 4), ("c", 4)],
        "src string, dst bigint",
    )
    out = {(r["a"], r["b"]): r for r in node_similarity(e, top_k=5).collect()}
    assert out[("a", "b")]["jaccard"] == pytest.approx(0.5)
    assert out[("b", "c")]["jaccard"] == pytest.approx(1 / 3)
    assert ("a", "c") not in out and ("c", "a") not in out
    assert out[("b", "a")]["rank"] == 1 and out[("b", "c")]["rank"] == 2


def test_node_similarity_degree_cap_drops_hub(spark):
    """A neighbor above the cap stops generating candidate pairs: with
    cap 2, the 3-owner hub item is excluded and only the pair sharing a
    quiet item survives (its Jaccard now over capped neighbor sets)."""
    from neo4j_graphdb_spark.graph.algorithms import node_similarity

    e = spark.createDataFrame(
        [("a", 99), ("b", 99), ("c", 99), ("a", 1), ("b", 1)],
        "src string, dst bigint",
    )
    uncapped = node_similarity(e, top_k=5)
    assert uncapped.filter(F.col("a") == "c").count() == 2
    capped = {
        (r["a"], r["b"]): r
        for r in node_similarity(e, top_k=5, degree_cap=2).collect()
    }
    assert set(capped) == {("a", "b"), ("b", "a")}
    assert capped[("a", "b")]["jaccard"] == pytest.approx(1.0)


def test_random_walks_deterministic_and_terminating(spark):
    """The hash choice is replayable in plain Python (md5 → first 15 hex
    → mod degree), and a walk reaching a sink node simply ends."""
    import hashlib

    from neo4j_graphdb_spark.graph.algorithms import random_walks

    # "a" has neighbors b,c ; b has only sink d ; c loops back to a
    e = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "d"), ("c", "a")],
        "src string, dst string",
    )
    starts = spark.createDataFrame([("a",)], "node_id string")
    out = random_walks(e, starts, n_steps=3)
    got = {r["step"]: r["node"] for r in out.collect()}

    def pick(walk, step, node, nbrs):
        h = int(hashlib.md5(f"{walk}:{step}:{node}".encode()).hexdigest()[:15], 16)
        return sorted(nbrs)[h % len(nbrs)]

    nbrs = {"a": ["b", "c"], "b": ["d"], "c": ["a"]}
    expect, node = {0: "a"}, "a"
    for i in (1, 2, 3):
        if node not in nbrs:
            break
        node = pick("a", i, node, nbrs[node])
        expect[i] = node
    assert got == expect
    # run twice — identical (no RNG state anywhere)
    again = {r["step"]: r["node"] for r in random_walks(e, starts, n_steps=3).collect()}
    assert again == got


def test_random_walks_sink_start_stays_put(spark):
    from neo4j_graphdb_spark.graph.algorithms import random_walks

    e = spark.createDataFrame([("a", "b")], "src string, dst string")
    starts = spark.createDataFrame([("b",)], "node_id string")
    rows = random_walks(e, starts, n_steps=5).collect()
    assert [(r["step"], r["node"]) for r in rows] == [(0, "b")]


def test_clustering_coefficient_hand_checked(spark):
    """K4 minus one edge: nodes 1,2 (deg 3) sit in 2 triangles each ->
    lcc 2/3; nodes 3,4 (deg 2) sit in 1 -> lcc 1. A pendant node 5 has
    deg 1 -> lcc 0 by convention."""
    from neo4j_graphdb_spark.graph.algorithms import clustering_coefficient

    e = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (1, 5)],
        "src bigint, dst bigint",
    )
    out = {r["v"]: r for r in clustering_coefficient(e).collect()}
    assert (out[1]["degree"], out[1]["triangles"]) == (4, 2)
    assert out[1]["lcc"] == pytest.approx(2 / 6)
    assert (out[2]["degree"], out[2]["triangles"]) == (3, 2)
    assert out[2]["lcc"] == pytest.approx(2 / 3)
    for v in (3, 4):
        assert (out[v]["degree"], out[v]["triangles"]) == (2, 1)
        assert out[v]["lcc"] == pytest.approx(1.0)
    assert (out[5]["degree"], out[5]["triangles"], out[5]["lcc"]) == (1, 0, 0.0)


def test_clustering_matches_global_triangle_count(spark):
    """Σ per-node triangles = 3 × global count (each triangle credits
    its three corners) on a mixed random-ish graph."""
    from neo4j_graphdb_spark.graph.algorithms import (
        clustering_coefficient,
        triangle_count,
    )

    edges = [(i, (i * 7 + 3) % 20) for i in range(20)] + [
        (i, (i + 1) % 20) for i in range(20)
    ]
    e = spark.createDataFrame(edges, "src bigint, dst bigint")
    total = triangle_count(e).collect()[0]["triangles"]
    per_node = clustering_coefficient(e).agg(F.sum("triangles")).collect()[0][0]
    assert per_node == 3 * total


def test_landmark_closeness_path_graph(spark):
    """Path 'a'-'b'-'c'-'d' (undirected): md5 ordering is fixed, so the
    landmark set with k=2 is deterministic; hand-check harmonic_x12."""
    from neo4j_graphdb_spark.graph.algorithms import landmark_closeness

    und = [("a", "b"), ("b", "c"), ("c", "d")]
    edges = spark.createDataFrame(
        und + [(d, s) for s, d in und], "src string, dst string"
    )
    # md5 order of {a,b,c,d}: computed here, not assumed
    import hashlib

    ids = sorted("abcd", key=lambda x: (hashlib.md5(x.encode()).hexdigest(), x))
    lms = set(ids[:2])
    out = {
        r["id"]: (r["n_reached"], r["harmonic_x12"])
        for r in landmark_closeness(edges, n_landmarks=2, max_hops=4).collect()
    }
    pos = {c: i for i, c in enumerate("abcd")}
    for node in "abcd":
        reach = [lm for lm in lms if lm != node]
        exp_n = len(reach)
        exp_h = sum(12 // abs(pos[lm] - pos[node]) for lm in reach)
        if exp_n:
            assert out[node] == (exp_n, exp_h), node
        else:
            assert node not in out


def test_landmark_closeness_disconnected(spark):
    """Two 2-cliques: a node never reaches the other component's
    landmarks; n_reached counts only its own side."""
    from neo4j_graphdb_spark.graph.algorithms import landmark_closeness

    und = [("a", "b"), ("x", "y")]
    edges = spark.createDataFrame(
        und + [(d, s) for s, d in und], "src string, dst string"
    )
    out = {
        r["id"]: (r["n_reached"], r["harmonic_x12"])
        for r in landmark_closeness(edges, n_landmarks=4, max_hops=4).collect()
    }
    # every node is a landmark (k=4 >= |V|); each reaches only its pair
    assert out == {k: (1, 12) for k in ["a", "b", "x", "y"]}


def test_skipgram_pairs_window(spark):
    """One 3-step walk a->b->c->d, window 2: pair multiset is symmetric
    and distance-bounded."""
    from neo4j_graphdb_spark.graph.algorithms import skipgram_pairs

    walks = spark.createDataFrame(
        [("w", i, n) for i, n in enumerate("abcd")],
        "walk_id string, step int, node string",
    )
    got = {
        (r["center"], r["context"]): r["n_pairs"]
        for r in skipgram_pairs(walks, window=2).collect()
    }
    pos = {c: i for i, c in enumerate("abcd")}
    exp = {}
    for c in "abcd":
        for x in "abcd":
            d = abs(pos[c] - pos[x])
            if 0 < d <= 2:
                exp[(c, x)] = exp.get((c, x), 0) + 1
    assert got == exp


def test_skipgram_pairs_counts_repeat_visits(spark):
    """A walk that revisits a node produces multiple pairs, aggregated
    into n_pairs."""
    from neo4j_graphdb_spark.graph.algorithms import skipgram_pairs

    walks = spark.createDataFrame(
        [("w", 0, "a"), ("w", 1, "b"), ("w", 2, "a")],
        "walk_id string, step int, node string",
    )
    got = {
        (r["center"], r["context"]): r["n_pairs"]
        for r in skipgram_pairs(walks, window=2).collect()
    }
    assert got[("a", "b")] == 2 and got[("b", "a")] == 2
    assert got[("a", "a")] == 2  # step 0 <-> step 2, both directions


def test_landmark_betweenness_path_and_star(spark):
    """All nodes as landmarks: path a-b-c-d gives the interior nodes 2
    pair-paths each; a 3-leaf star routes all 3 leaf pairs through the
    hub."""
    from neo4j_graphdb_spark.graph.algorithms import landmark_betweenness

    und = [("a", "b"), ("b", "c"), ("c", "d")]
    path = spark.createDataFrame(
        und + [(d, s) for s, d in und], "src string, dst string"
    )
    got = {
        r["id"]: r["betweenness"]
        for r in landmark_betweenness(path, n_landmarks=4, max_hops=4).collect()
    }
    assert got == {"b": 2, "c": 2}

    star_und = [("x", "l1"), ("x", "l2"), ("x", "l3")]
    star = spark.createDataFrame(
        star_und + [(d, s) for s, d in star_und], "src string, dst string"
    )
    got = {
        r["id"]: r["betweenness"]
        for r in landmark_betweenness(star, n_landmarks=4, max_hops=4).collect()
    }
    assert got == {"x": 3}


def test_modularity_two_triangles(spark):
    """Two triangles joined by a bridge, communities = the triangles:
    m=7, L_c=3 each, d_c=7 each -> Q = (4*7*6 - 98)/196 = 70/196."""
    from neo4j_graphdb_spark.graph.algorithms import modularity

    tri = [("a", "b"), ("b", "c"), ("a", "c"), ("d", "e"), ("e", "f"), ("d", "f"), ("c", "d")]
    edges = spark.createDataFrame(tri, "src string, dst string")
    comm = spark.createDataFrame(
        [(n, 1) for n in "abc"] + [(n, 2) for n in "def"], "id string, lbl int"
    )
    row = modularity(edges, comm).collect()[0]
    assert row["m"] == 7 and row["n_communities"] == 2 and row["intra_edges"] == 6
    assert abs(row["modularity"] - 70 / 196) < 1e-12

    # duplicate / reversed input edges canonicalize away
    noisy = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    row2 = modularity(noisy, comm).collect()[0]
    assert row2["m"] == 7 and abs(row2["modularity"] - 70 / 196) < 1e-12


def test_modularity_all_one_community(spark):
    """A single community holding every node: Q = 1 - 1 = ... exactly
    (4*m*m - (2m)^2)/(4m^2) = 0."""
    from neo4j_graphdb_spark.graph.algorithms import modularity

    edges = spark.createDataFrame([("a", "b"), ("b", "c")], "src string, dst string")
    comm = spark.createDataFrame([(n, 9) for n in "abc"], "id string, lbl int")
    row = modularity(edges, comm).collect()[0]
    assert row["modularity"] == 0.0 and row["intra_edges"] == 2


def test_neighbor_degree_stats_star(spark):
    """Star hub x with 3 leaves (symmetrized): hub's neighbors all have
    degree 1; each leaf's single neighbor has degree 3."""
    from neo4j_graphdb_spark.graph.algorithms import neighbor_degree_stats

    und = [("x", "l1"), ("x", "l2"), ("x", "l3")]
    edges = spark.createDataFrame(
        und + [(d, s) for s, d in und], "src string, dst string"
    )
    got = {
        r["id"]: (r["degree"], r["mean_nbr_degree"], r["max_nbr_degree"])
        for r in neighbor_degree_stats(edges).collect()
    }
    assert got["x"] == (3, 1.0, 1)
    for leaf in ("l1", "l2", "l3"):
        assert got[leaf] == (1, 3.0, 3)


def test_landmark_eccentricity_path(spark):
    """Path a-b-c-d, all nodes landmarks: ecc lower bound equals the
    true eccentricity (3, 2, 2, 3)."""
    from neo4j_graphdb_spark.graph.algorithms import landmark_eccentricity

    und = [("a", "b"), ("b", "c"), ("c", "d")]
    edges = spark.createDataFrame(
        und + [(d, s) for s, d in und], "src string, dst string"
    )
    got = {
        r["id"]: r["ecc_lb"]
        for r in landmark_eccentricity(edges, n_landmarks=4, max_hops=4).collect()
    }
    assert got == {"a": 3, "b": 2, "c": 2, "d": 3}


def test_degree_histogram_power_of_two_bins(spark):
    """Degrees 1, 2, 3, 8 land in bins 0, 1, 1, 3 — power-of-two edges
    must not misbin (the floating-log failure mode)."""
    from neo4j_graphdb_spark.graph.algorithms import degree_histogram

    # star hubs of controlled degree: h1->1 leaf, h2->2, h3->3, h8->8
    rows = []
    leaf = 0
    for hub, d in (("h1", 1), ("h2", 2), ("h3", 3), ("h8", 8)):
        for _ in range(d):
            rows.append((hub, f"x{leaf}"))
            leaf += 1
    edges = spark.createDataFrame(rows, "src string, dst string")
    got = {
        r["bin"]: (r["n_nodes"], r["min_degree"], r["max_degree"])
        for r in degree_histogram(edges).collect()
    }
    # leaves all have degree 1 -> bin 0 holds h1 + 14 leaves
    assert got[0] == (15, 1, 1)
    assert got[1] == (2, 2, 3)  # h2, h3
    assert got[3] == (1, 8, 8)  # h8 — exactly on the 2^3 edge
    assert 2 not in got


def test_adamic_adar_hand_checked(spark):
    """Bipartite users->items: u1,u2 share item z (3 owners) and item y
    (2 owners); u3 owns only z. AA(u1,u2) = 1/ln(3) + 1/ln(2);
    AA(u1,u3) = 1/ln(3)."""
    import math

    from neo4j_graphdb_spark.graph.algorithms import adamic_adar

    edges = spark.createDataFrame(
        [("u1", "z"), ("u2", "z"), ("u3", "z"), ("u1", "y"), ("u2", "y")],
        "src string, dst string",
    )
    got = {
        (r["a"], r["b"]): (r["aa_score"], r["rank"])
        for r in adamic_adar(edges, top_k=5).collect()
    }
    both = round(1 / math.log(3) + 1 / math.log(2), 6)
    z_only = round(1 / math.log(3), 6)
    assert got[("u1", "u2")] == (both, 1)
    assert got[("u1", "u3")] == (z_only, 2)
    assert got[("u3", "u1")][0] == z_only


def test_hierarchy_flatten_hand_checked(spark):
    """Two trees: 1←2←4, 1←3 and a lone root 10 (NULL parent); pointer
    doubling must recover exact depths, roots, and full ancestor paths
    even with rounds far beyond the depth (root self-loop fixpoint)."""
    from neo4j_graphdb_spark.graph.algorithms import hierarchy_flatten

    parents = spark.createDataFrame(
        [(1, None), (2, 1), (3, 1), (4, 2), (10, None)],
        "id bigint, parent bigint",
    )
    got = {
        r["id"]: (r["root"], r["depth"], list(r["path"]))
        for r in hierarchy_flatten(parents, rounds=4).collect()
    }
    assert got == {
        1: (1, 0, []),
        2: (1, 1, [1]),
        3: (1, 1, [1]),
        4: (1, 2, [2, 1]),
        10: (10, 0, []),
    }


def test_hierarchy_flatten_deep_chain_log_rounds(spark):
    """A 20-deep chain resolves with 5 doubling rounds (2^5 = 32 ≥ 20) —
    the log-round guarantee the operator exists for."""
    from neo4j_graphdb_spark.graph.algorithms import hierarchy_flatten

    rows = [(0, None)] + [(i, i - 1) for i in range(1, 21)]
    parents = spark.createDataFrame(rows, "id bigint, parent bigint")
    got = {r["id"]: (r["root"], r["depth"]) for r in hierarchy_flatten(parents, rounds=5).collect()}
    assert got[20] == (0, 20)
    assert got[0] == (0, 0)
    assert all(got[i] == (0, i) for i in range(21))


def test_incremental_components_equals_full_recompute(spark):
    """Delta edges that (a) merge two base components, (b) connect two
    base-isolated nodes, and (c) land inside one existing component must
    yield labels bit-identical to CC over the union."""
    from neo4j_graphdb_spark.graph.algorithms import (
        connected_components,
        incremental_components,
    )

    nodes = spark.createDataFrame([(i,) for i in range(10)], "node_id bigint")
    base = spark.createDataFrame(
        [(0, 1), (1, 2), (3, 4), (5, 6)], "src bigint, dst bigint"
    )
    delta = spark.createDataFrame(
        [(2, 3), (7, 8), (0, 2)], "src bigint, dst bigint"
    )
    inc = {
        r["id"]: r["comp"]
        for r in incremental_components(nodes, base, delta).collect()
    }
    full = {
        r["id"]: r["comp"]
        for r in connected_components(nodes, base.unionByName(delta)).collect()
    }
    assert inc == full
    assert inc[4] == 0 and inc[8] == 7 and inc[9] == 9


def test_neighbor_sample_cap_and_determinism(spark):
    """k-cap holds per source, sampled edges are a subset of the input,
    and two runs pick the identical md5-ranked sample."""
    from neo4j_graphdb_spark.graph.algorithms import neighbor_sample

    edges = spark.createDataFrame(
        [(1, d) for d in range(20)] + [(2, 100), (2, 101)],
        "src bigint, dst bigint",
    )
    s1 = {(r["src"], r["dst"], r["rn"]) for r in neighbor_sample(edges, k=5).collect()}
    s2 = {(r["src"], r["dst"], r["rn"]) for r in neighbor_sample(edges, k=5).collect()}
    assert s1 == s2
    by_src = {}
    for src, dst, rn in s1:
        by_src.setdefault(src, []).append(rn)
        assert (src, dst) in {(1, d) for d in range(20)} | {(2, 100), (2, 101)}
    assert sorted(by_src[1]) == [1, 2, 3, 4, 5]
    assert sorted(by_src[2]) == [1, 2]


def test_degree_assortativity_star_is_minus_one(spark):
    """A star K(1,3) is maximally disassortative: every edge pairs the
    hub (deg 3) with a leaf (deg 1), so the endpoint-degree Pearson
    correlation is exactly −1; a clean 4-cycle (all degrees equal) is
    degenerate (zero variance) — excluded by construction here."""
    from neo4j_graphdb_spark.graph.algorithms import degree_assortativity

    star = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3)], "src bigint, dst bigint"
    )
    row = degree_assortativity(star).collect()[0]
    assert row["m_directed_pairs"] == 6
    assert row["assortativity"] == -1.0


def test_biased_walks_bias_and_validity(spark):
    """Second-order bias steers the walk: on a symmetric star, step 2
    from the hub with a 999:1:1 return weight sends every walk back to
    its start; every consecutive pair must be a real edge; two runs are
    identical; zero weights reject."""
    import pytest as _p

    from neo4j_graphdb_spark.graph.algorithms import biased_walks

    half = [(0, 1), (0, 2), (0, 3)]
    edges = spark.createDataFrame(
        half + [(b, a) for a, b in half], "src bigint, dst bigint"
    ).selectExpr("cast(src as string) src", "cast(dst as string) dst")
    starts = spark.createDataFrame([("1",), ("2",), ("3",)], "node_id string")

    out = biased_walks(edges, starts, n_steps=2, w_return=999, w_shared=1, w_far=1)
    rows = {(r["walk_id"], r["step"]): r["node"] for r in out.collect()}
    for s in ("1", "2", "3"):
        assert rows[(s, 0)] == s
        assert rows[(s, 1)] == "0"  # a leaf's only neighbor
        assert rows[(s, 2)] == s  # 999:1:1 return bias wins

    again = {
        (r["walk_id"], r["step"]): r["node"]
        for r in biased_walks(
            edges, starts, n_steps=2, w_return=999, w_shared=1, w_far=1
        ).collect()
    }
    assert rows == again

    edge_set = {("0", x) for x in "123"} | {(x, "0") for x in "123"}
    for s in ("1", "2", "3"):
        for step in (1, 2):
            assert (rows[(s, step - 1)], rows[(s, step)]) in edge_set

    with _p.raises(ValueError):
        biased_walks(edges, starts, n_steps=2, w_return=0)


def test_pagerank_tol_early_exit_matches_fixed(spark, toy):
    """The L∞-residual early exit (tol) stops sooner yet lands within
    tol-scale distance of the long fixed run; the always-on bit-exact
    exit never changes values (same call, higher cap, identical result
    when the sequence is already stationary)."""
    nodes, edges = toy
    fixed = {r["node_id"]: r["rank"] for r in pagerank(nodes, edges, max_iter=60).collect()}
    tolr = {r["node_id"]: r["rank"] for r in pagerank(nodes, edges, max_iter=60, tol=1e-10).collect()}
    assert set(fixed) == set(tolr)
    assert all(abs(fixed[k] - tolr[k]) < 1e-8 for k in fixed)
    assert abs(sum(tolr.values()) - 1.0) < 1e-6


def test_hits_tol_converges_to_fixed_point(spark):
    """Bipartite 2×2 complete graph: normalized hub/auth vectors are
    uniform at the fixed point; the tol run must reach them and stop
    under the cap (values equal the long fixed run within tol-scale)."""
    from neo4j_graphdb_spark.graph.algorithms import hits

    nodes = spark.createDataFrame([(i,) for i in range(4)], "node_id bigint")
    edges = spark.createDataFrame(
        [(0, 2), (0, 3), (1, 2), (1, 3)], "src bigint, dst bigint"
    )
    ht = {r["node_id"]: (r["hub"], r["auth"]) for r in
          hits(nodes, edges, max_iter=50, tol=1e-9).collect()}
    import math
    inv = 1 / math.sqrt(2)
    assert abs(ht[0][0] - inv) < 1e-6 and abs(ht[1][0] - inv) < 1e-6
    assert abs(ht[2][1] - inv) < 1e-6 and abs(ht[3][1] - inv) < 1e-6
    assert ht[2][0] == 0.0 and ht[0][1] == 0.0


def test_scc_hand_graph(spark):
    """Two 2-cycles bridged by a one-way edge + a tail: SCCs are the two
    cycles and singletons — and the bridge direction must NOT merge
    them (undirected CC would)."""
    from neo4j_graphdb_spark.graph.algorithms import (
        connected_components,
        strongly_connected_components,
    )

    nodes = spark.createDataFrame([(i,) for i in range(1, 6)], "node_id bigint")
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 4), (4, 3), (4, 5)],
        "src bigint, dst bigint",
    )
    scc = {
        r["node_id"]: r["scc"]
        for r in strongly_connected_components(nodes, edges, max_rounds=6).collect()
    }
    assert scc == {1: 1, 2: 1, 3: 3, 4: 3, 5: 5}
    # the same graph is ONE undirected component — direction is the point
    cc = {
        r["id"]: r["comp"] for r in connected_components(nodes, edges).collect()
    }
    assert len(set(cc.values())) == 1


def test_scc_dag_is_all_singletons(spark):
    from neo4j_graphdb_spark.graph.algorithms import strongly_connected_components

    nodes = spark.createDataFrame([(i,) for i in range(4)], "node_id bigint")
    edges = spark.createDataFrame([(0, 1), (1, 2), (1, 3)], "src bigint, dst bigint")
    scc = {
        r["node_id"]: r["scc"]
        for r in strongly_connected_components(nodes, edges).collect()
    }
    assert scc == {0: 0, 1: 1, 2: 2, 3: 3}


def test_scc_long_cycle_converges_or_raises(spark):
    """A 12-node directed cycle is ONE SCC; with max_iter too small for the
    min-label to circulate, the inner fixpoint must raise rather than
    settle a fragmented labeling (ADVICE r6: partially-propagated labels
    can satisfy _f == _b with a non-minimal member id)."""
    from neo4j_graphdb_spark.graph.algorithms import strongly_connected_components

    n = 12
    nodes = spark.createDataFrame([(i,) for i in range(n)], "node_id bigint")
    edges = spark.createDataFrame(
        [(i, (i + 1) % n) for i in range(n)], "src bigint, dst bigint"
    )
    scc = {
        r["node_id"]: r["scc"]
        for r in strongly_connected_components(nodes, edges, max_iter=30).collect()
    }
    assert set(scc.values()) == {0} and len(scc) == n
    with pytest.raises(ValueError, match="did not converge"):
        strongly_connected_components(nodes, edges, max_iter=3)
    # exact boundary: the min label needs n-1 propagation steps to
    # circulate the cycle; max_iter = n-1 must succeed (the convergence
    # check needs one EXTRA confirming pass, which the implementation
    # grants on top of max_iter rather than spuriously raising)
    exact = {
        r["node_id"]: r["scc"]
        for r in strongly_connected_components(
            nodes, edges, max_iter=n - 1
        ).collect()
    }
    assert set(exact.values()) == {0} and len(exact) == n


def test_k_truss_k2_is_whole_graph(spark):
    """k=2 threshold is support >= 0, so EVERY edge survives — including
    triangle-free ones that never appear in the support aggregate
    (ADVICE r6: the peeling loop used to drop them)."""
    from neo4j_graphdb_spark.graph.algorithms import k_truss

    df = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)], "src bigint, dst bigint"
    )
    t2 = {(r["u"], r["v"]) for r in k_truss(df, k=2).collect()}
    assert t2 == {(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)}


def test_weighted_pagerank_weight_direction(spark):
    """Two leaves feed a hub with weights 3 and 1 via an intermediate
    pair: the heavier path's midpoint must outrank the lighter one's,
    and weight=1 everywhere must equal the unweighted run exactly."""
    nodes = spark.createDataFrame([(i,) for i in range(5)], "node_id bigint")
    edges = spark.createDataFrame(
        [(0, 1, 3.0), (0, 2, 1.0), (1, 3, 1.0), (2, 4, 1.0)],
        "src bigint, dst bigint, w double",
    )
    pr = {
        r["node_id"]: r["rank"]
        for r in pagerank(nodes, edges, max_iter=10, weight_col="w").collect()
    }
    assert pr[1] > pr[2]  # 3/4 of node 0's rank flows to 1, 1/4 to 2
    assert abs(sum(pr.values()) - 1.0) < 1e-6
    uni = spark.createDataFrame(
        [(0, 1, 1.0), (0, 2, 1.0)], "src bigint, dst bigint, w double"
    )
    nodes3 = spark.createDataFrame([(i,) for i in range(3)], "node_id bigint")
    a = {r["node_id"]: r["rank"] for r in pagerank(nodes3, uni, max_iter=6, weight_col="w").collect()}
    b = {r["node_id"]: r["rank"] for r in pagerank(nodes3, uni.select("src", "dst"), max_iter=6).collect()}
    assert all(abs(a[k] - b[k]) < 1e-12 for k in a)


def test_k_truss_cascading_peel(spark):
    """K4 with a pendant triangle: the 4-truss keeps exactly the K4 —
    the pendant triangle's edges support only 1 triangle each and peel;
    their removal must NOT cascade into the clique. A 5-truss of K4 is
    empty (support 2 < 3)."""
    from neo4j_graphdb_spark.graph.algorithms import k_truss

    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),  # K4
             (4, 5), (4, 6), (5, 6)]                          # pendant tri
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    t4 = {(r["u"], r["v"]) for r in k_truss(df, k=4).collect()}
    assert t4 == {(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)}
    assert k_truss(df, k=5).count() == 0
    # k=3 keeps every triangle edge (support >= 1), drops nothing here
    t3 = {(r["u"], r["v"]) for r in k_truss(df, k=3).collect()}
    assert t3 == set(edges)


def test_k_truss_chain_cascade(spark):
    """Two triangles sharing an edge: the shared edge has support 2 but
    the outer edges have 1 — under k=4 the outer edges peel first and
    the shared edge must then CASCADE out (its triangles vanished)."""
    from neo4j_graphdb_spark.graph.algorithms import k_truss

    df = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)], "src bigint, dst bigint"
    )
    assert k_truss(df, k=4).count() == 0


def test_node_similarity_metric_trio(spark):
    """Jaccard/overlap/cosine on a hand wedge: A={1,2}, B={2,3}, so
    jaccard=1/3, overlap=1/2, cosine=1/2; a strict subset C={2}⊂B gives
    overlap 1.0 while jaccard stays 1/2."""
    import pytest as _p
    from neo4j_graphdb_spark.graph.algorithms import node_similarity

    e = spark.createDataFrame(
        [("A", 1), ("A", 2), ("B", 2), ("B", 3), ("C", 2)],
        "src string, dst bigint",
    )
    def score(metric, x, y):
        out = {(r["a"], r["b"]): r["jaccard"]
               for r in node_similarity(e, top_k=5, metric=metric).collect()}
        return out[(x, y)]

    assert score("jaccard", "A", "B") == _p.approx(1 / 3)
    assert score("overlap", "A", "B") == _p.approx(1 / 2)
    assert score("cosine", "A", "B") == _p.approx(1 / 2)
    assert score("overlap", "C", "B") == _p.approx(1.0)
    assert score("jaccard", "C", "B") == _p.approx(1 / 2)
    with _p.raises(ValueError):
        node_similarity(e, metric="nope")


def test_louvain_two_cliques(spark):
    """Louvain local-move fixpoint: two 5-cliques joined by one bridge
    resolve to exactly the two cliques (labels = min member); weights
    steer membership — a heavily-weighted bridge pulls its endpoint."""
    from neo4j_graphdb_spark.graph.algorithms import louvain_communities

    edges = []
    for base in (0, 5):
        for i in range(5):
            for j in range(i + 1, 5):
                edges.append((base + i, base + j, 1.0))
    edges.append((0, 5, 1.0))
    nodes = spark.createDataFrame([(i,) for i in range(10)], "node_id bigint")
    e = spark.createDataFrame(edges, "src bigint, dst bigint, w double")
    out = {
        r["node_id"]: r["community"]
        for r in louvain_communities(nodes, e).collect()
    }
    assert all(out[i] == 0 for i in range(5))
    assert all(out[i] == 5 for i in range(5, 10))
    # same labels with the weight column (all 1.0 == unweighted)
    outw = {
        r["node_id"]: r["community"]
        for r in louvain_communities(nodes, e, weight_col="w").collect()
    }
    assert outw == out
    # an isolated node keeps its own singleton community
    nodes2 = spark.createDataFrame([(i,) for i in range(11)], "node_id bigint")
    out2 = {
        r["node_id"]: r["community"]
        for r in louvain_communities(nodes2, e).collect()
    }
    assert out2[10] == 10


def test_louvain_multilevel_resolution_limit(spark):
    """c99: the aggregation phase merges what single-node moves cannot.
    Resolution-limit fixture — D bridged triangle-pairs (dumbbells):
    one-level Louvain leaves 2 communities per dumbbell (every single
    bridge-endpoint crossing is modularity-negative), the multilevel
    run merges each pair via a level-2 super-node move (gain
    1 − 3.5/D > 0), landing on community = smallest member. Also pins
    the swap-break: super-node pairs are mutual-best SINGLETONS at
    level 2, so without it same-parity pairs would swap forever and
    never merge."""
    from neo4j_graphdb_spark.graph.algorithms import (
        louvain_communities,
        louvain_multilevel,
    )

    D = 6
    edges = []
    for g in range(D):
        b = 6 * g
        for t in (0, 3):
            edges += [
                (b + t, b + t + 1), (b + t, b + t + 2),
                (b + t + 1, b + t + 2),
            ]
        edges.append((b + 2, b + 3))
    e = spark.createDataFrame(edges, "src long, dst long")
    n = spark.createDataFrame([(i,) for i in range(6 * D)], "node_id long")

    one = louvain_communities(n, e, max_sweeps=10).collect()
    assert len({r["community"] for r in one}) == 2 * D  # stops short
    multi = louvain_multilevel(n, e, max_sweeps=10).collect()
    assert {r["community"] for r in multi} == {6 * g for g in range(D)}
    assert all(r["community"] == 6 * (r["node_id"] // 6) for r in multi)
    # determinism: bit-identical on rerun
    again = louvain_multilevel(n, e, max_sweeps=10).collect()
    assert sorted(map(tuple, multi)) == sorted(map(tuple, again))


def test_weighted_sssp_relaxation(spark):
    """Bellman-Ford relaxation finds the cheaper 2-hop route over the
    heavier direct edge, and early-exits when nothing improves."""
    from neo4j_graphdb_spark.graph.algorithms import weighted_sssp

    edges = spark.createDataFrame(
        [("a", "b", 10.0), ("a", "c", 1.0), ("c", "b", 2.0), ("b", "d", 1.0)],
        "src string, dst string, weight double",
    )
    srcs = spark.createDataFrame([("a",)], "id string")
    out = {
        (r["source"], r["id"]): r["dist"]
        for r in weighted_sssp(edges, srcs, max_rounds=5).collect()
    }
    assert out[("a", "a")] == 0.0
    assert out[("a", "c")] == 1.0
    assert out[("a", "b")] == 3.0  # via c, not the direct 10
    assert out[("a", "d")] == 4.0


def test_luby_mis_properties(spark):
    """MIS invariants on a hand-built graph: the result is independent
    (no edge joins two members), maximal (every excluded node touches a
    member), complete after 8 rounds (no undecided), and identical
    across hash modes in its invariants."""
    from neo4j_graphdb_spark.graph.algorithms import luby_mis

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"),  # 4-cycle
         ("e", "f"),                                        # isolated pair
         ("g", "a")],                                       # pendant
        "src string, dst string",
    )
    for mode in ("xxhash64", "md5_60"):
        out = {r["node"]: r["state"] for r in luby_mis(edges, hash_mode=mode).collect()}
        assert set(out) == set("abcdefg")
        assert "undecided" not in out.values()
        mis = {n for n, s in out.items() if s == "mis"}
        adj = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("e", "f"), ("g", "a")]
        # independence
        assert not any(u in mis and v in mis for u, v in adj)
        # maximality: every non-member has a member neighbor
        nbrs = {}
        for u, v in adj:
            nbrs.setdefault(u, set()).add(v)
            nbrs.setdefault(v, set()).add(u)
        for n, s in out.items():
            if s == "excluded":
                assert nbrs[n] & mis, n
    # determinism: two runs agree exactly
    a = sorted(luby_mis(edges).collect())
    b = sorted(luby_mis(edges).collect())
    assert a == b


def test_csr_export_offsets_are_exact_prefix_sums(spark):
    from neo4j_graphdb_spark.graph.algorithms import csr_export

    edges = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 10),       # dup edge collapses
         (5, 20),
         (2001, 30), (2001, 31), (2001, 32)],  # second bucket (width 1000)
        "src long, dst long",
    )
    out = {r["src"]: r for r in csr_export(edges, bucket_width=1000).collect()}
    assert out[1]["degree"] == 2 and out[1]["neighbors"] == "10,11"
    assert out[1]["offset"] == 0
    assert out[5]["offset"] == 2          # after src 1's two neighbors
    assert out[2001]["offset"] == 3       # cross-bucket base carries over
    assert out[2001]["neighbors"] == "30,31,32"
    # CSR invariant: offsets sorted by src are the running degree sum
    srcs = sorted(out)
    acc = 0
    for s in srcs:
        assert out[s]["offset"] == acc
        acc += out[s]["degree"]
    out2 = {r["src"]: r for r in
            csr_export(edges.repartition(7), bucket_width=1000).collect()}
    assert out == out2
