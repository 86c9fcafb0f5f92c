"""Schema -> DataFrame-plan compiler.

Re-expression of ``cartography/graph/querybuilder.py`` (which compiles the
same declarative schemas to Cypher text): here a :class:`NodeSchema` plus an
input DataFrame compiles to

- a **node-updates plan** (:func:`compile_node_updates`) — the analog of the
  generated ``UNWIND … MERGE (i:Label{id: item.Id}) SET …`` ingest query
  (``querybuilder.py:427-487``), and
- one **edge-updates plan per declared relationship**
  (:func:`compile_edge_updates`) — the analog of the per-rel ``CALL {}``
  subqueries (``querybuilder.py:256-322``): each rel is its own independent
  join, so an unmatched target never suppresses the node or its other rels.

There is no index-ensure step (``querybuilder.py:490-551``): in columnar
land the equivalent is table layout — the store partitions by label /
rel_label and relies on parquet min-max pruning. ``extra_index`` refs
PROMOTE the property to a typed top-level ``_p_<name>`` column (store
schema evolution), so matcher joins against it get stats-based
row-group pruning — the columnar replacement for the reference's
auto-created matcher-key indexes.
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

from pyspark.sql import DataFrame, functions as F

from cartography_spark.operators.linking import matcher_join
from cartography_spark.schema.common import PropertyRef
from cartography_spark.schema.nodes import NodeSchema
from cartography_spark.schema.relationships import LinkDirection, MatchLinkSchema, RelSchema


def _props_map(props: Mapping[str, PropertyRef], params: Mapping[str, Any] | None) -> F.Column:
    """Build a map<string,string> of declared properties, in declared order
    (deterministic for the store's dedupe). Null values are kept out of the
    map (MERGE's SET with null clears nothing here; undeclared/absent keys
    are retained by the store's LAST_WIN concat)."""
    entries = []
    for name, ref in props.items():
        entries.append(F.lit(name))
        entries.append(ref.to_column(params).cast("string"))
    m = F.create_map(*entries) if entries else F.expr("map()")
    return F.map_filter(m, lambda k, v: v.isNotNull())


def _scope_value(schema: NodeSchema, params: Mapping[str, Any] | None) -> F.Column:
    sub = schema.sub_resource_relationship
    if sub is None:
        return F.lit(None).cast("string")
    # The sub-resource matcher conventionally matches the tenant by id
    # (querybuilder.py:200-213); its value (usually a run kwarg) is the
    # node's scope stamp.
    ref = next(iter(sub.target_node_matcher.keys.values()))
    return ref.to_column(params).cast("string")


def compile_node_updates(
    schema: NodeSchema, df: DataFrame, params: Mapping[str, Any] | None = None
) -> DataFrame:
    """Input rows -> store-shaped node updates (label, id, extra_labels,
    scope_id, props [, _p_<key> promoted columns]).

    Properties declared with ``extra_index=True`` are ADDITIONALLY
    emitted as top-level ``_p_<name>`` columns — the store evolves the
    node table schema and later matcher joins read the typed column
    instead of ``element_at(props, name)``, so the lookup gets parquet
    min/max row-group pruning (the reference auto-indexes every matcher
    key, ``querybuilder.py:490-551``; a map lookup has no stats)."""
    id_ref = schema.properties["id"]
    other = {k: v for k, v in schema.properties.items() if k != "id"}
    promoted = [
        ref.to_column(params).try_cast(ref.index_type or "string").alias(f"_p_{name}")
        for name, ref in other.items()
        if ref.extra_index
    ]
    return df.select(
        F.lit(schema.label).alias("label"),
        id_ref.to_column(params).cast("string").alias("id"),
        F.lit(list(schema.extra_node_labels)).cast("array<string>").alias("extra_labels"),
        _scope_value(schema, params).alias("scope_id"),
        _props_map(other, params).alias("props"),
        *promoted,
    ).where(F.col("id").isNotNull())


def _node_key_col_for(targets: DataFrame):
    """Accessor factory for matcher keys on stored target nodes:
    engine-managed columns directly; a promoted ``_p_<name>`` column
    when the table has one (typed, stats-pruned); else the props map."""
    available = set(targets.columns)

    def accessor(name: str) -> F.Column:
        if name in ("id", "label", "scope_id"):
            return F.col(name)
        if f"_p_{name}" in available:
            return F.col(f"_p_{name}")
        return F.element_at(F.col("props"), name)

    return accessor


def compile_edge_updates(
    schema: NodeSchema,
    df: DataFrame,
    target_nodes: DataFrame,
    params: Mapping[str, Any] | None = None,
    selected_rels: Sequence[RelSchema] | None = None,
) -> list[DataFrame]:
    """One edge-updates plan per declared relationship.

    ``target_nodes`` is the current node table (the graph-as-source read,
    reference S5). ``selected_rels`` mirrors the reference's
    selected-relationship loading (``querybuilder.py:370-424``): load only a
    validated subset of declared rels.
    """
    rels = list(schema.all_relationships) if selected_rels is None else list(selected_rels)
    declared = list(schema.all_relationships)
    for r in rels:
        if r not in declared:
            raise ValueError(
                f"RelSchema({r.rel_label}) is not declared on NodeSchema({schema.label})"
            )

    id_ref = schema.properties["id"]
    plans: list[DataFrame] = []
    for rel in rels:
        items = df.select(
            id_ref.to_column(params).cast("string").alias("__item_id"),
            *[c for c in df.columns],
        ).where(F.col("__item_id").isNotNull())
        targets = target_nodes.where(F.col("label") == rel.target_node_label)
        joined = matcher_join(
            items,
            targets,
            dict(rel.target_node_matcher.keys),
            params,
            target_key_col=_node_key_col_for(targets),
        )
        item_id, tgt_id = F.col("__item_id"), F.col("__t_id")
        if rel.direction == LinkDirection.OUTWARD:
            src, dst = item_id, tgt_id
            src_label, dst_label = F.lit(schema.label), F.lit(rel.target_node_label)
        else:
            src, dst = tgt_id, item_id
            src_label, dst_label = F.lit(rel.target_node_label), F.lit(schema.label)
        plans.append(
            joined.select(
                F.lit(rel.rel_label).alias("rel_label"),
                src.alias("src"),
                dst.alias("dst"),
                src_label.alias("src_label"),
                dst_label.alias("dst_label"),
                _scope_value(schema, params).alias("scope_id"),
                _props_map(rel.properties, params).alias("props"),
            )
        )
    return plans


def compile_matchlink(
    link: MatchLinkSchema,
    df: DataFrame,
    nodes: DataFrame,
    params: Mapping[str, Any] | None = None,
    scope_id: str | None = None,
) -> DataFrame:
    """MatchLink (J7): edge candidates joined to BOTH endpoint node sets;
    rows missing either endpoint drop (two inner joins = the two MATCH
    clauses of ``querybuilder.py:616-684``). The sub-resource scope is
    mandatory for its cleanup (``querybuilder.py:634-643``)."""
    if scope_id is None:
        raise ValueError("MatchLink load requires scope_id (cleanup scope)")
    src_nodes = nodes.where(F.col("label") == link.source_node_label)
    j1 = matcher_join(df, src_nodes, dict(link.source_node_matcher.keys), params, _node_key_col_for(src_nodes))
    j1 = j1.withColumnRenamed("__t_id", "__src_id").select(
        "__src_id", *[c for c in df.columns]
    )
    tgt_nodes = nodes.where(F.col("label") == link.target_node_label)
    j2 = matcher_join(j1, tgt_nodes, dict(link.target_node_matcher.keys), params, _node_key_col_for(tgt_nodes))
    src, dst = F.col("__src_id"), F.col("__t_id")
    if link.direction == LinkDirection.INWARD:
        src, dst = dst, src
        s_lab, d_lab = link.target_node_label, link.source_node_label
    else:
        s_lab, d_lab = link.source_node_label, link.target_node_label
    return j2.select(
        F.lit(link.rel_label).alias("rel_label"),
        src.alias("src"),
        dst.alias("dst"),
        F.lit(s_lab).alias("src_label"),
        F.lit(d_lab).alias("dst_label"),
        F.lit(scope_id).alias("scope_id"),
        _props_map(link.properties, params).alias("props"),
    )
