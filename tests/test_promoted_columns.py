"""Promoted matcher columns (round-3): ``extra_index=True`` properties
become typed top-level ``_p_<name>`` columns in the node table via store
schema evolution, and matcher joins read them instead of
``element_at(props, name)`` — recovering the stats-pruned lookups the
reference gets from auto-created matcher-key indexes
(``cartography/graph/querybuilder.py:490-551``)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cartography_spark.pipeline.sync import load
from cartography_spark.schema import (
    LinkDirection,
    NodeSchema,
    PropertyRef,
    RelSchema,
    TargetNodeMatcher,
)
from cartography_spark.store.graphstore import GraphStore

HUMAN = NodeSchema(
    label="Human",
    properties={"id": PropertyRef("hid"), "email": PropertyRef("email", extra_index=True)},
)

ACCOUNT = NodeSchema(
    label="Account",
    properties={"id": PropertyRef("aid"), "owner_mail": PropertyRef("owner_mail")},
    other_relationships=(
        RelSchema(
            rel_label="OWNED_BY",
            target_node_label="Human",
            target_node_matcher=TargetNodeMatcher({"email": PropertyRef("owner_mail")}),
        ),
    ),
)


@pytest.fixture()
def store(spark, tmp_path):
    return GraphStore(spark, str(tmp_path / "graph"))


def _humans(spark, rows):
    return spark.createDataFrame(rows, "hid string, email string")


def test_extra_index_promotes_typed_column(spark, store):
    load(store, HUMAN, _humans(spark, [("h1", "a@x.io"), ("h2", "b@x.io")]), 100)
    nodes = store.read_nodes()
    assert "_p_email" in nodes.columns
    got = {r["id"]: r["_p_email"] for r in nodes.collect()}
    assert got == {"h1": "a@x.io", "h2": "b@x.io"}
    # prop also stays in the map (promoted column is the indexed copy)
    assert {r["id"]: r["props"]["email"] for r in nodes.collect()} == got
    assert store._manifest("nodes")["columns"] == ["_p_email"]


def test_promoted_column_survives_merge_and_compact(spark, store):
    load(store, HUMAN, _humans(spark, [("h1", "a@x.io")]), 100)
    # merge of a schema WITHOUT the promoted column must not clobber it
    plain = spark.createDataFrame(
        [("Human", "h1", {"team": "eng"})], "label string, id string, props map<string,string>"
    )
    store.merge_nodes(plain, 200)
    row = store.read_nodes().collect()[0]
    assert row["_p_email"] == "a@x.io" and row["props"]["team"] == "eng"
    store.compact("nodes")
    row = store.read_nodes().collect()[0]
    assert row["_p_email"] == "a@x.io"
    assert store._manifest("nodes")["columns"] == ["_p_email"]


def test_promoted_key_lookup_is_pushed_down(spark, store):
    """The done-criterion: a filter on the promoted key must reach the
    parquet scan as PushedFilters (parquet min/max row-group pruning) —
    an element_at(props, k) filter cannot."""
    load(store, HUMAN, _humans(spark, [(f"h{i}", f"u{i}@x.io") for i in range(50)]), 100)
    q = store.read_nodes().where(F.col("_p_email") == "u7@x.io")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(_p_email), EqualTo(_p_email,u7@x.io)]" in plan
    assert [r["id"] for r in q.collect()] == ["h7"]


def test_matcher_join_prefers_promoted_column(spark, store):
    """The OWNED_BY matcher keys on Human.email: with the promoted
    column present the join plan must read _p_email, not the props map,
    and produce the same edges."""
    load(store, HUMAN, _humans(spark, [("h1", "a@x.io"), ("h2", "b@x.io")]), 100)
    accounts = spark.createDataFrame(
        [("acc1", "a@x.io"), ("acc2", "b@x.io"), ("acc3", "nobody@x.io")],
        "aid string, owner_mail string",
    )
    out = load(store, ACCOUNT, accounts, 100)
    assert out["edges"] == 2
    edges = {(r["src"], r["dst"]) for r in store.read_edges().collect()}
    assert edges == {("acc1", "h1"), ("acc2", "h2")}
    # plan evidence: the edge-compile join reads the promoted column
    from cartography_spark.schema.compiler import compile_edge_updates

    plan_df = compile_edge_updates(ACCOUNT, accounts, store.read_nodes())[0]
    plan = plan_df._jdf.queryExecution().optimizedPlan().toString()
    assert "_p_email" in plan
    assert "element_at(props, email)" not in plan


def test_sweep_works_with_promoted_columns(spark, store):
    """The staleness sweep must be oblivious to evolved schemas."""
    schema = NodeSchema(
        label="Human",
        properties={
            "id": PropertyRef("hid"),
            "email": PropertyRef("email", extra_index=True),
        },
        scoped_cleanup=False,
        other_relationships=(
            RelSchema(
                rel_label="KNOWS",
                target_node_label="Human",
                target_node_matcher=TargetNodeMatcher({"id": PropertyRef("hid")}),
            ),
        ),
    )
    load(store, schema, _humans(spark, [("h1", "a@x.io"), ("h2", "b@x.io")]), 100)
    load(store, schema, _humans(spark, [("h1", "a@x.io")]), 200)
    out = store.sweep(schema, 200)
    assert out["nodes_deleted"] == 1
    rows = store.read_nodes().collect()
    assert [r["id"] for r in rows] == ["h1"] and rows[0]["_p_email"] == "a@x.io"
