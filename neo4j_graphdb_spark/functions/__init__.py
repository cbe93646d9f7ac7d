from neo4j_graphdb_spark.functions.text import (
    clean_text,
    ingest_filter,
    impute_publisher,
    word_count,
    quality_score_cols,
    doc_fingerprint,
    detect_language,
)

__all__ = [
    "clean_text",
    "ingest_filter",
    "impute_publisher",
    "word_count",
    "quality_score_cols",
    "doc_fingerprint",
    "detect_language",
]
