"""Typed read API (tx.py analog) and CLI lifecycle."""

from __future__ import annotations

import json

import pytest

from cartography_spark.pipeline.sync import load
from cartography_spark.schema import NodeSchema, PropertyRef
from cartography_spark.store.graphstore import GraphStore
from cartography_spark.store.reads import (
    create_graph_views,
    read_list_of_dicts,
    read_list_of_tuples,
    read_list_of_values,
    read_single_dict,
    read_single_value,
)

THING = NodeSchema(label="Thing", properties={"id": PropertyRef("tid")})


@pytest.fixture()
def store(spark, tmp_path):
    s = GraphStore(spark, str(tmp_path / "g"))
    load(s, THING, spark.createDataFrame([("a",), ("b",), ("c",)], "tid string"), 100)
    return s


def test_typed_reads_sql(store):
    q = "SELECT id FROM graph_nodes WHERE label = 'Thing' ORDER BY id"
    assert read_list_of_values(store, q) == ["a", "b", "c"]
    assert read_single_value(store, q) == "a"
    assert read_list_of_dicts(store, q) == [{"id": "a"}, {"id": "b"}, {"id": "c"}]
    assert read_list_of_tuples(store, q) == [("a",), ("b",), ("c",)]
    assert read_single_dict(store, q) == {"id": "a"}
    assert read_single_value(store, "SELECT id FROM graph_nodes WHERE id = 'zz'") is None


def test_typed_reads_dataframe(store):
    df = store.read_nodes().where("label = 'Thing'").selectExpr("id").orderBy("id")
    assert read_list_of_values(store, df) == ["a", "b", "c"]


def test_graph_views(store, spark):
    create_graph_views(store)
    n = spark.sql("SELECT count(*) AS n FROM graph_nodes").collect()[0]["n"]
    assert n == 3


def test_cli_sync_and_resweep(spark, tmp_path, capsys):
    from cartography_spark.cli import main

    store_dir = str(tmp_path / "clistore")
    rc = main(["--cores", "8", "sync", "--store", store_dir, "--pages", "300",
               "--update-tag", "111"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(out["stages"]) == {"seed", "ingest", "sweep"}

    g = GraphStore(spark, store_dir)
    assert g.read_nodes().where("label='Entity'").count() > 0
    assert g.read_edges().where("rel_label='IN_CRAWL'").count() > 0
    assert g.read_edges().where("rel_label='RELATES_TO'").count() > 0

    # rerun same tag resumes (ledger) — stages skip
    rc = main(["--cores", "8", "sync", "--store", store_dir, "--pages", "300",
               "--update-tag", "111"])
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert all(v == "skipped(resume)" for v in out2["stages"].values())
