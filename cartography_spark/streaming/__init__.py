from cartography_spark.streaming.stream import (
    stream_pages_to_triples,
    stream_triple_counts,
)

__all__ = ["stream_pages_to_triples", "stream_triple_counts"]
