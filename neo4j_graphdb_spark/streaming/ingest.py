"""Streaming ingest → graph upsert (tier C13).

The reference's crawl loop is a synchronous batch loop writing one record
per Bolt round trip (``/root/reference/src/crwling.py:109-186``). The
streaming-native re-expression: a ``readStream`` source feeding
``foreachBatch``, where each micro-batch runs the SAME batched MERGE
upsert as the batch path (writer.py) — one code path for both, the
canonical Structured Streaming upsert-sink pattern.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession

from neo4j_graphdb_spark.writer import GraphStore, WriteSummary


def stream_upsert_sink(
    stream_df: DataFrame,
    store: GraphStore,
    label: str,
    key_col: str,
    prop_cols: list[str],
    checkpoint_dir: str,
):
    """Attach a foreachBatch MERGE-upsert sink; returns the StreamingQuery.

    Each micro-batch is one batched upsert (A7/A8 semantics + counters),
    serialized by Structured Streaming's exactly-once batch ids.
    """
    summaries: list[WriteSummary] = []

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        summaries.append(store.merge_nodes(batch_df, label, key_col, prop_cols))

    q = (
        stream_df.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q._upsert_summaries = summaries  # inspection hook for tests
    return q


def run_stream_to_memory(
    spark: SparkSession,
    stream_df: DataFrame,
    output_mode: str = "complete",
    name: str | None = None,
) -> DataFrame:
    """Run a streaming transformation to completion (availableNow) into a
    memory sink and return the materialized result as a batch DataFrame.

    This is how the driver-facing queries() entries exercise the REAL
    streaming engine (state store, incremental execution) while still
    returning a comparable batch result.
    """
    name = name or f"mem_{uuid.uuid4().hex[:8]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
