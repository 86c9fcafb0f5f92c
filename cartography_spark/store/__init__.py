from cartography_spark.store.graphstore import (
    EDGES_SCHEMA,
    GraphStore,
    NODES_SCHEMA,
    merge_frames,
)

__all__ = ["GraphStore", "NODES_SCHEMA", "EDGES_SCHEMA", "merge_frames"]
