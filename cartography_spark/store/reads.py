"""Typed read/query API over the graph store.

Re-expression of the reference's client read helpers
(``cartography/client/core/tx.py``): list-of-values (``:22-49``),
single value (``:52-84``), list-of-dicts (``:87-110``), list-of-tuples
(``:113-144``), single dict (``:147-175``) — plus SQL views so the
sample-query corpus (``docs/root/usage/samplequeries.md``) runs as
``spark.sql`` over ``graph_nodes`` / ``graph_edges``.

The reference pushes Cypher text; here the "query" argument is either a
DataFrame the caller built or a SQL string over the registered views —
both arrive at the same Catalyst plan.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

from cartography_spark.store.graphstore import GraphStore


def create_graph_views(
    store: GraphStore,
    spark: SparkSession | None = None,
    nodes_view: str = "graph_nodes",
    edges_view: str = "graph_edges",
) -> None:
    """Register the current store version as temp views for spark.sql."""
    spark = spark or store.spark
    store.read_nodes().createOrReplaceTempView(nodes_view)
    store.read_edges().createOrReplaceTempView(edges_view)


def _frame(store: GraphStore, query: DataFrame | str) -> DataFrame:
    if isinstance(query, str):
        create_graph_views(store)
        return store.spark.sql(query)
    return query


def read_list_of_values(store: GraphStore, query: DataFrame | str) -> list[Any]:
    """First column of every row (tx.py:22-49)."""
    df = _frame(store, query)
    col = df.columns[0]
    return [r[col] for r in df.collect()]


def read_single_value(store: GraphStore, query: DataFrame | str) -> Any:
    """First column of the first row, or None (tx.py:52-84)."""
    df = _frame(store, query)
    rows = df.limit(1).collect()
    return rows[0][df.columns[0]] if rows else None


def read_list_of_dicts(store: GraphStore, query: DataFrame | str) -> list[dict[str, Any]]:
    """All rows as dicts (tx.py:87-110)."""
    return [r.asDict() for r in _frame(store, query).collect()]


def read_list_of_tuples(store: GraphStore, query: DataFrame | str) -> list[tuple]:
    """All rows as tuples (tx.py:113-144)."""
    return [tuple(r) for r in _frame(store, query).collect()]


def read_single_dict(store: GraphStore, query: DataFrame | str) -> dict[str, Any] | None:
    """First row as a dict, or None (tx.py:147-175)."""
    rows = _frame(store, query).limit(1).collect()
    return rows[0].asDict() if rows else None
