"""Drift detection: set difference between two graph-store snapshots.

Re-expression of ``cartography/driftdetect/detect_deviations.py:70-116``
(``perform_drift_detection`` / ``compare_states``): tuple-ize each
result row, ``new = end − start``, ``missing = start − end``. Here the
"states" are two versions of the store's node (or edge) table — the
store's versioned layout gives time travel for free, the Spark analog
of Iceberg snapshot-diff incremental reads.

Scale: ``exceptAll`` is a shuffle hash anti-aggregation on the full
row; project to the drift-relevant columns first so the shuffle carries
only those.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

from cartography_spark.store.graphstore import GraphStore


def state_diff(
    start: DataFrame, end: DataFrame, columns: Sequence[str] | None = None
) -> tuple[DataFrame, DataFrame]:
    """(new_rows, missing_rows) between two query results, duplicate-
    sensitive (exceptAll), matching the reference's list-of-tuples set
    semantics."""
    if columns:
        start = start.select(*columns)
        end = end.select(*columns)
    return end.exceptAll(start), start.exceptAll(end)


def node_drift(
    store: GraphStore,
    start_version: str,
    end_version: str | None = None,
    label: str | None = None,
) -> DataFrame:
    """Node-level drift report between two store versions: one row per
    added/removed (label, id) with a ``change`` column."""
    start = store.read_nodes(start_version)
    end = store.read_nodes(end_version)
    if label is not None:
        start = start.where(F.col("label") == label)
        end = end.where(F.col("label") == label)
    key = ["label", "id"]
    new, missing = state_diff(start, end, key)
    return new.withColumn("change", F.lit("added")).unionByName(
        missing.withColumn("change", F.lit("removed"))
    )
