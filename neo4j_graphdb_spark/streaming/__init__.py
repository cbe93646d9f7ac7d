from neo4j_graphdb_spark.streaming.windows import (
    tumbling_window_agg,
    sliding_window_agg,
    session_window_agg,
    stream_dedup,
)
from neo4j_graphdb_spark.streaming.ingest import stream_upsert_sink, run_stream_to_memory

__all__ = [
    "tumbling_window_agg",
    "sliding_window_agg",
    "session_window_agg",
    "stream_dedup",
    "stream_upsert_sink",
    "run_stream_to_memory",
]
