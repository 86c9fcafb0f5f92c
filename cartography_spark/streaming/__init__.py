from cartography_spark.streaming.stream import (
    run_to_table,
    stream_curate,
    stream_session_stats,
    stream_dedup_first_seen,
    stream_pages_to_triples,
    stream_to_store,
    stream_triple_counts,
)

__all__ = [
    "stream_pages_to_triples", "stream_triple_counts", "run_to_table",
    "stream_to_store", "stream_dedup_first_seen", "stream_curate",
    "stream_session_stats",
]
