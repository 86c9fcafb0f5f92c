"""MERGE semantics tests — the fixture-scenario analog of the reference's
two-run integration tests (e.g.
``tests/integration/cartography/intel/lastpass/test_users.py``): load,
re-load with a new update_tag, assert firstseen preserved / lastupdated
bumped / props overwritten-not-erased."""

from __future__ import annotations

import pytest

from cartography_spark.store.graphstore import GraphStore


@pytest.fixture()
def store(spark, tmp_path):
    return GraphStore(spark, str(tmp_path / "graph"))


def _nodes_df(spark, rows):
    return spark.createDataFrame(
        rows, "label string, id string, scope_id string, props map<string,string>"
    )


def test_merge_nodes_create_then_update(spark, store):
    r1 = store.merge_nodes(
        _nodes_df(spark, [("Person", "p1", "s1", {"name": "Ada", "team": "eng"})]), 100
    )
    assert r1["created"] == 1 and r1["updated"] == 0

    r2 = store.merge_nodes(
        _nodes_df(spark, [("Person", "p1", "s1", {"name": "Ada L"}), ("Person", "p2", "s1", {"name": "Bob"})]),
        200,
    )
    assert r2["created"] == 1 and r2["updated"] == 1

    rows = {r["id"]: r for r in store.read_nodes().collect()}
    assert rows["p1"]["lastupdated"] == 200
    # firstseen set only on create (querybuilder.py:450-459)
    assert int(rows["p1"]["firstseen"].timestamp()) == 100
    assert int(rows["p2"]["firstseen"].timestamp()) == 200
    # declared props overwrite; undeclared props retained
    assert rows["p1"]["props"]["name"] == "Ada L"
    assert rows["p1"]["props"]["team"] == "eng"


def test_merge_is_idempotent_under_retry(spark, store):
    df = _nodes_df(spark, [("Person", "p1", "s1", {"name": "Ada"})] * 3)  # retry dupes
    store.merge_nodes(df, 100)
    store.merge_nodes(df, 100)  # replayed partition
    rows = store.read_nodes().collect()
    assert len(rows) == 1
    assert int(rows[0]["firstseen"].timestamp()) == 100


def test_merge_edges_keyed_and_firstseen(spark, store):
    edges = spark.createDataFrame(
        [("KNOWS", "a", "b", "P", "P", "s1", {"w": "1"})],
        "rel_label string, src string, dst string, src_label string, dst_label string, scope_id string, props map<string,string>",
    )
    store.merge_edges(edges, 100)
    edges2 = spark.createDataFrame(
        [("KNOWS", "a", "b", "P", "P", "s1", {"w": "2"})],
        edges.schema,
    )
    store.merge_edges(edges2, 200)
    rows = store.read_edges().collect()
    assert len(rows) == 1
    assert rows[0]["props"]["w"] == "2"
    assert int(rows[0]["firstseen"].timestamp()) == 100
    assert rows[0]["lastupdated"] == 200


def test_versions_snapshot_isolation(spark, store):
    store.merge_nodes(_nodes_df(spark, [("X", "1", None, {})]), 1)
    v1 = store._pointer()["nodes"]
    store.merge_nodes(_nodes_df(spark, [("X", "2", None, {})]), 2)
    assert store.read_nodes(version=v1).count() == 1
    assert store.read_nodes().count() == 2
