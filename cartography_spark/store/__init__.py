from cartography_spark.store.graphstore import GraphStore, NODES_SCHEMA, EDGES_SCHEMA

__all__ = ["GraphStore", "NODES_SCHEMA", "EDGES_SCHEMA"]
