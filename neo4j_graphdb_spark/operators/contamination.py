"""Benchmark-contamination detection over a document corpus.

Training-data hygiene: before a corpus is used for training, every
document is scored for n-gram overlap against a *benchmark set* (eval
prompts, test questions, held-out references). Documents whose shingles
collide with the benchmark above a threshold are quarantined so the eval
stays honest. This is the standard decontamination pass described in
public LLM training reports (GPT-3 §B, PaLM §7, Llama) — n-gram
collision, not semantic match.

Scale shape (100 TB corpus, ~MB-scale benchmark):

* the benchmark's distinct shingles are tiny (thousands of rows) →
  **broadcast** to every executor; the corpus-side explode never
  shuffles on the join;
* per-document totals come from the *same* exploded frame, so the whole
  score is one scan of the corpus, one broadcast join, one `groupBy(id)`
  shuffle — no all-pairs path anywhere;
* shingles are compared as 64-bit ``xxhash64`` values, not strings:
  the checkpointed exploded frame and the broadcast set carry 8-byte
  keys instead of ~40-byte gram strings (measured ~2x end-to-end at
  sf0.1), and the join semantics are identical up to a ~2^-64-per-pair
  collision — invisible next to the 5-gram heuristic itself.

No reference twin: the reference engine (a Neo4j ingest crawler,
/root/reference/src/crwling.py) has no decontamination stage; this is a
north-star extension per SURVEY.md §2 tier C / the training-pipeline
mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from neo4j_graphdb_spark.operators.dedup import word_shingles
from neo4j_graphdb_spark.session import spread_partitions


def contamination_scores(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
    n: int = 5,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Per-document benchmark-overlap score.

    Returns ``(id_col, n_grams, n_contaminated, contamination_frac)``:
    the count of the document's **distinct** word ``n``-grams, how many
    of them appear anywhere in the benchmark set, and their ratio
    (0.0 for documents with no grams).

    ``benchmark`` is any DataFrame with a text column
    (``bench_text_col``, default ``text_col``); its union-of-shingles is
    deduplicated once and broadcast (set ``broadcast_benchmark=False``
    if the benchmark is itself huge — the join then shuffles on the
    shingle key, still never all-pairs).
    """
    bcol = bench_text_col or text_col
    # spread the CPU-heavy shingle explode across the cluster: a
    # single-file corpus arrives as ONE input split (observed at sf0.1 —
    # the whole explode serialized on one core), and the narrow
    # repartition of raw docs is noise next to the per-gram work it
    # parallelizes; at 100 TB the file count makes this a no-op cost
    docs = docs.repartition(
        docs.sparkSession.sparkContext.defaultParallelism, F.col(id_col)
    )
    # lazily checkpointed: both the totals and the hit counts read this
    # frame — without it the shingle explode (and the corpus scan under
    # it) executes twice, same double-execution minhash_lsh_pairs guards
    # against
    doc_grams = docs.select(
        F.col(id_col),
        F.explode(
            F.transform(word_shingles(text_col, n), lambda g: F.xxhash64(g))
        ).alias("gram"),
    ).localCheckpoint(eager=False)
    bench_grams = benchmark.select(
        F.explode(F.transform(word_shingles(bcol, n), lambda g: F.xxhash64(g))).alias("gram")
    ).distinct()
    if broadcast_benchmark:
        bench_grams = F.broadcast(bench_grams)
    hit = doc_grams.join(bench_grams, on="gram", how="left_semi")
    totals = doc_grams.groupBy(id_col).agg(F.count("*").alias("n_grams"))
    hits = hit.groupBy(id_col).agg(F.count("*").alias("n_contaminated"))
    return (
        docs.select(id_col)
        .join(totals, on=id_col, how="left")
        .join(hits, on=id_col, how="left")
        .select(
            F.col(id_col),
            F.coalesce("n_grams", F.lit(0)).cast("bigint").alias("n_grams"),
            F.coalesce("n_contaminated", F.lit(0))
            .cast("bigint")
            .alias("n_contaminated"),
            F.round(
                F.when(
                    F.coalesce("n_grams", F.lit(0)) > 0,
                    F.coalesce("n_contaminated", F.lit(0))
                    / F.col("n_grams").cast("double"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("contamination_frac"),
        )
    )
