"""Per-round benchmark: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and print ONE JSON line.

Headliners cover every workload class the engine claims: scan+agg,
multi-way broadcast joins, as-of/range temporal joins, the hypertable
rollup cascade, the graph expand, iterative CC, LSH dedup, brute-force
cosine top-k, windowed aggregation, the MERGE write path, and the
training-data curation pipeline (contamination scan, sequence packing,
global shuffle, sessionization).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "rel_pricing_summary",
    "rel_top_customers",
    "rel_region_revenue",
    "rel_window_topn",
    "rel_asof_join",
    "rel_range_join",
    "rel_time_rollup",
    "a3_expand",
    "a7_merge_upsert",
    "b3_html_extract",
    "c1_degrees",
    "c3_connected_components",
    "c7_exact_dedup",
    "c8_minhash_lsh",
    "c9_cosine_topk",
    "c14_tumbling_window",
    "c15_session_window",
    "c20_contamination",
    "c22_seq_pack",
    "c30_global_shuffle",
    "rel_sessionize",
    # round 6 additions — gap-fill grid, iterative normalized graph op,
    # co-occurrence similarity join, 5-way broadcast-chain join
    "rel_gap_fill",
    "c36_hits",
    "c37_node_similarity",
    "rel_market_share",
    # later round-6 additions — landmark multi-source BFS, per-document
    # window adjacency + vocabulary-sized dimension joins
    "c44_closeness",
    "c48_bigram_lm",
    # round 5 (this round) additions — PQ codebook+ADC search, pointer-
    # doubling hierarchy, BPE training loop, Bloom pre-join pruning,
    # sort-based skyline, incremental CC maintenance
    "c66_pq_topk",
    "rel_hierarchy",
    "c67_bpe_merges",
    "c68_bloom_semi_join",
    "rel_skyline",
    "c70_incremental_cc",
    # Arrow/mapInPandas round-trip throughput + time-range window frame
    "c78_real_bmp_decode",
    "rel_rolling_1h",
    # round 6 additions — GraphRAG retrieve→expand→rerank composition,
    # FW-BW strongly-connected components (directed cycles)
    "c84_graphrag",
    "c85_scc",
    "c92_boilerplate",
    "c93_phash_near_dup",
    # round 7 additions — ExactSubstr duplicated-span removal,
    # temperature/alpha corpus mixing
    "c96_span_removal",
    "c97_temperature_mixture",
    # round 11 additions — MMR diversity re-rank (bounded greedy over a
    # top-pool), exact pigeonhole-blocked edit-distance dedup, CUBE
    # multi-level subtotals, Z-order clustering key
    "c104_mmr_rerank",
    "c105_levenshtein_near_dup",
    "rel_cube_rollup",
    "c109_zorder_layout",
    # late round 11 additions — CCNet paragraph dedup (skew-immune
    # min-struct winner election), NPMI co-occurrence graph build,
    # deterministic HLL registers + finalize
    "c111_paragraph_dedup",
    "c116_term_cooccurrence",
    "c117_hll_sketch",
    # round 13 additions — per-document Kneser-Ney perplexity gate
    # (full bigram LM + per-doc integer fixed-point scoring), and the
    # cross-table PassJoin fuzzy join at its exact (uncapped) config
    "c134_perplexity_filter",
    "c133_fuzzy_join",
    # late round 13 — DCLM-style model-based quality gate (hashed
    # features + sparse dot product, integer margin; pure column algebra)
    "c136_quality_classifier",
    # round 14 additions — chained OPTIONAL MATCH (two left-outer legs
    # on the live frame, the second anchored on the first's optional
    # alias) and the duration.between decomposition over 100k events
    # (pure Catalyst datetime arithmetic, zero UDFs)
    "a109_text_optional_chain",
    "a110_text_temporal_between",
    # round 15 additions — statement-leading OPTIONAL MATCH (empty-pad
    # via broadcast anti-join probe) and ORDER BY on an un-projected
    # aggregate (hidden-column lift into the one implicit groupBy)
    "a117_text_leading_optional",
    "a120_text_orderby_aggregate",
    # round 16 additions — full existential subquery (correlated semi +
    # anti joins in one WHERE) and the undirected variable-length
    # ladder over the symmetrized edge frame
    "a122_text_exists_subquery",
    "a123_text_undirected_varlen",
]


def _release_blocks(spark) -> None:
    """Inter-query cleanup, OUTSIDE every timed region — the per-query
    timing methodology (one warmup, two timed runs, min) is unchanged.

    ``clearCache()`` releases persisted DataFrames but NOT
    ``localCheckpoint()`` RDD blocks; those normally free only when the
    ContextCleaner notices the driver-side RDD object got GC'd, which is
    lazy and unbounded. Left alone, checkpoint blocks from the iterative
    queries (CC/SCC fixpoints, writer merges) accumulate across the list
    and LATER queries absorb the tenured-heap GC pressure — measured as
    e.g. c134_perplexity_filter costing 7.7 s in-bench vs 1.6 s isolated
    on the identical code (and the r13→r15 "headline drift"). Explicitly
    unpersisting every still-persisted RDD between queries makes the
    cleanup deterministic. Safe HERE because between queries no live
    DataFrame can reference the dropped blocks (each timed run builds its
    plan from scratch); it would NOT be safe inside a query."""
    spark.catalog.clearCache()
    # blocking unpersist: the non-blocking form (r16) returned before the
    # block manager actually dropped the blocks, so the removal I/O raced
    # into the NEXT timed region
    for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        rdd.unpersist(True)
    # full GC keeps tenured garbage from iterative queries out of later
    # queries' timed regions (measured r16: late-list queries 2-6× slower
    # without it); the short settle pause lets the post-GC async work the
    # GC kicks off (ContextCleaner shuffle/broadcast cleanup) finish
    # OUTSIDE the next timed region instead of racing into it
    spark.sparkContext._jvm.System.gc()
    time.sleep(0.25)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    from neo4j_graphdb_spark.registry import QUERIES
    from neo4j_graphdb_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM + first-scan warmup so q1 doesn't absorb session startup cost
    from neo4j_graphdb_spark.session import load_table

    load_table(spark, sf_dir, "lineitem").count()

    # one warmup execution per query (JIT, code cache, file-listing
    # caches), then TWO measured runs keeping the min — steady-state
    # throughput is the meaningful proxy for at-scale cost (per-job
    # fixed overhead amortizes to nothing), and the min discards
    # transient host-contention spikes that hit one run but not both
    timings: dict[str, float] = {}
    for name in HEADLINE:
        QUERIES[name](spark, sf_dir).count()
        _release_blocks(spark)  # drop warmup-run persists before timing
        best, n = None, 0
        for _ in range(2):
            t0 = time.time()
            df = QUERIES[name](spark, sf_dir)
            n = df.count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            # drop this run's blocks so they don't accumulate into GC
            # pressure (and timing spikes) for the next run / next query
            _release_blocks(spark)
        timings[name] = round(best, 3)
        print(f"# {name}: {n} rows in {timings[name]}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    # Sidecar runs BEFORE the headline JSON so the one-JSON-line contract
    # holds: the headline line must be the ABSOLUTE LAST stdout line the
    # driver captures (r11 lost its official bench number to the old
    # print-then-sidecar order — VERDICT r11 #4).
    _bench_vs_duckdb_sidecar(sf_dir)
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


def _infer_round() -> int:
    """Current round number = the newest driver correctness artifact: the
    driver writes CORRECTNESS_r{N}.json BEFORE it runs bench.py in the
    same round N (observed r11: CORRECTNESS_r11 existed at bench time),
    so round = max(N), not max+1. Overridable via SPARK_GRAFT_ROUND."""
    if os.environ.get("SPARK_GRAFT_ROUND"):
        return int(os.environ["SPARK_GRAFT_ROUND"])
    import glob
    import re as _re

    here = os.path.dirname(os.path.abspath(__file__))
    ns = [
        int(m.group(1))
        for f in glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))
        if (m := _re.search(r"_r(\d+)\.json$", f))
    ]
    return max(ns) if ns else 0


def _bench_vs_duckdb_sidecar(sf_dir: str) -> None:
    """BASELINE.md publishes no upstream numbers, so the binding
    yardstick is DuckDB on identical SQL over identical parquet within
    2x. Produce that evidence EVERY round, builder-side: re-run the
    headliners through scripts/check_oracles.py (wall-timed both
    engines; single cold pass — the bound is 2x, noise is fine) and write
    BENCH_VS_DUCKDB_r{N}.json next to the driver's artifacts. Guarded:
    opt out with SPARK_GRAFT_BENCH_VS_DUCKDB=0; failures never break
    the bench contract (the ONE JSON line above already went out)."""
    if os.environ.get("SPARK_GRAFT_BENCH_VS_DUCKDB", "1") == "0":
        return
    import subprocess

    here = os.path.dirname(os.path.abspath(__file__))
    out = os.path.join(here, f"BENCH_VS_DUCKDB_r{_infer_round():02d}.json")
    try:
        subprocess.run(
            [
                sys.executable,
                os.path.join(here, "scripts", "check_oracles.py"),
                "--json",
                out,
                sf_dir,
                *HEADLINE,
            ],
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
            timeout=600,
            cwd=here,
            check=False,
        )
    except Exception as ex:  # sidecar must never break the bench contract
        print(f"# bench-vs-duckdb sidecar skipped: {ex}", file=sys.stderr)


if __name__ == "__main__":
    main()
