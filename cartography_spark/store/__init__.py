from cartography_spark.store.graphstore import (
    EDGES_SCHEMA,
    GraphStore,
    NODES_SCHEMA,
    merge_frames,
)
from cartography_spark.store.reads import (
    create_graph_views,
    read_list_of_dicts,
    read_list_of_tuples,
    read_list_of_values,
    read_single_dict,
    read_single_value,
)

__all__ = [
    "GraphStore", "NODES_SCHEMA", "EDGES_SCHEMA", "merge_frames",
    "create_graph_views", "read_list_of_values", "read_single_value",
    "read_list_of_dicts", "read_list_of_tuples", "read_single_dict",
]
