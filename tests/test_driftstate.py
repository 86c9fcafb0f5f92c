"""Drift-detect state workflow round-trips, in the pattern of the
reference's ``tests/unit/driftdetect`` (detector load/dump, shortcut
add/replace, drift pairs incl. multi-value pipe fields) plus an
integration loop: get-state -> mutate store -> get-state -> detect."""

from __future__ import annotations

import json

import pytest

from cartography_spark.operators.driftstate import (
    State,
    add_shortcut,
    get_query_state,
    load_shortcuts,
    load_state,
    perform_drift_detection,
    write_state,
)
from cartography_spark.pipeline.sync import load
from cartography_spark.schema import NodeSchema, PropertyRef
from cartography_spark.store.graphstore import GraphStore

THING = NodeSchema(label="Thing", properties={"id": PropertyRef("tid")})


def _template(tmp_path, query):
    d = tmp_path / "detector"
    d.mkdir()
    (d / "template.json").write_text(
        json.dumps(
            {"name": "things", "validation_query": query, "properties": [], "results": []}
        )
    )
    return str(d)


def test_state_file_round_trip(tmp_path):
    s = State("q", "SELECT 1", ["a", "b"], [["1", "2"], ["3", "4|5"]])
    write_state(s, str(tmp_path), "1.json")
    got = load_state(str(tmp_path), "1.json")
    assert got == s


def test_state_file_validation(tmp_path):
    (tmp_path / "bad.json").write_text('{"name": "x"}')
    with pytest.raises(ValueError, match="missing fields"):
        load_state(str(tmp_path), "bad.json")


def test_shortcut_add_and_replace(tmp_path):
    d = str(tmp_path)
    add_shortcut(d, "most-recent", "1.json")
    assert load_shortcuts(d) == {"most-recent": "1.json"}
    add_shortcut(d, "baseline", "1.json")
    add_shortcut(d, "most-recent", "2.json")  # replaced
    assert load_shortcuts(d) == {"most-recent": "2.json", "baseline": "1.json"}
    # loading via alias resolves through shortcut.json
    write_state(State("q", "Q", ["a"], [["1"]]), d, "2.json")
    assert load_state(d, "most-recent").results == [["1"]]


def test_drift_pairs_and_pipe_fields():
    start = State("q", "Q", ["a", "vals"], [["1", "8|9"], ["2", "10"]])
    end = State("q", "Q", ["a", "vals"], [["2", "10"], ["3", "11|12"]])
    new, missing = perform_drift_detection(start, end)
    assert new == [["3", ["11", "12"]]]  # pipe fields split to lists
    assert missing == [["1", ["8", "9"]]]


def test_drift_validates_matching_states():
    a = State("q", "Q1", ["a"], [])
    b = State("q", "Q2", ["a"], [])
    with pytest.raises(ValueError, match="queries do not match"):
        perform_drift_detection(a, b)
    c = State("other", "Q1", ["a"], [])
    with pytest.raises(ValueError, match="names do not match"):
        perform_drift_detection(a, c)


def test_get_state_detect_loop(spark, tmp_path):
    """Integration: snapshot -> sync mutates the graph -> snapshot ->
    drift report, with most-recent shortcut maintenance."""
    store = GraphStore(spark, str(tmp_path / "g"))
    load(store, THING, spark.createDataFrame([("a",), ("b",)], "tid string"), 100)
    qdir = _template(
        tmp_path, "SELECT id FROM graph_nodes WHERE label = 'Thing' ORDER BY id"
    )
    s1 = get_query_state(store, qdir, "1.json")
    assert s1.results == [["a"], ["b"]]
    assert load_shortcuts(qdir)["most-recent"] == "1.json"

    load(store, THING, spark.createDataFrame([("c",)], "tid string"), 200)
    s2 = get_query_state(store, qdir, "2.json")
    assert load_shortcuts(qdir)["most-recent"] == "2.json"

    new, missing = perform_drift_detection(load_state(qdir, "1.json"), load_state(qdir, "most-recent"))
    assert new == [["c"]] and missing == []


def test_cli_drift_detect(spark, tmp_path, capsys):
    from cartography_spark.cli import main

    store = GraphStore(spark, str(tmp_path / "g"))
    load(store, THING, spark.createDataFrame([("a",)], "tid string"), 100)
    qdir = _template(
        tmp_path, "SELECT id FROM graph_nodes WHERE label = 'Thing' ORDER BY id"
    )
    assert main(["--cores", "8", "drift", "get-state", "--store", str(tmp_path / "g"),
                 "--query-directory", qdir, "--filename", "1.json"]) == 0
    load(store, THING, spark.createDataFrame([("b",)], "tid string"), 200)
    assert main(["--cores", "8", "drift", "get-state", "--store", str(tmp_path / "g"),
                 "--query-directory", qdir, "--filename", "2.json"]) == 0
    assert main(["drift", "add-shortcut", "--query-directory", qdir,
                 "--shortcut", "baseline", "--file", "1.json"]) == 0
    capsys.readouterr()
    assert main(["drift", "detect", "--query-directory", qdir,
                 "--start-state", "baseline", "--end-state", "most-recent"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["new"] == [["b"]] and out["missing"] == []


def test_state_diff_aligns_evolved_schemas(spark, tmp_path):
    """Round-4 ADVICE fix: a full-row state_diff between two store
    snapshots straddling a promoted-column declaration must run (typed
    NULL alignment) instead of exceptAll raising on mismatched
    schemas."""
    from cartography_spark.operators.drift import state_diff
    from cartography_spark.pipeline.sync import load
    from cartography_spark.schema import NodeSchema, PropertyRef
    from cartography_spark.store.graphstore import NODES_SCHEMA, GraphStore

    store = GraphStore(spark, str(tmp_path / "gevo"))
    plain = NodeSchema(label="User", properties={"id": PropertyRef("uid"), "email": PropertyRef("email")})
    promoted = NodeSchema(
        label="User",
        properties={"id": PropertyRef("uid"), "email": PropertyRef("email", extra_index=True)},
    )
    rows = spark.createDataFrame([("u1", "a@x.io")], "uid string, email string")
    load(store, plain, rows, 100)
    v1 = store._pointer()["nodes"]
    load(store, promoted, spark.createDataFrame([("u2", "b@x.io")], "uid string, email string"), 200)
    v2 = store._pointer()["nodes"]

    start = store._read_manifest_df("nodes", NODES_SCHEMA, store._manifest("nodes", v1))
    end = store._read_manifest_df("nodes", NODES_SCHEMA, store._manifest("nodes", v2))
    assert "_p_email" in end.columns and "_p_email" not in start.columns
    new, missing = state_diff(start, end)  # full-row: must not raise
    ids_new = {r["id"] for r in new.collect()}
    assert "u2" in ids_new
    assert missing.count() >= 0  # executes cleanly
