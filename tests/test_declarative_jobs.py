"""Declarative (serialized JSON) analysis jobs — the data-driven job
format of the reference (``graph/job.py:238-253`` run_from_json,
``intel/analysis.py:12-45`` user-supplied job directories), re-expressed
as DataFrame rewrites with Spark-SQL predicates and $PARAM templating.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from cartography_spark.pipeline.analysis import AnalysisJob, exposure_propagation
from cartography_spark.pipeline.sync import load
from cartography_spark.schema import (
    LinkDirection,
    NodeSchema,
    PropertyRef,
    RelSchema,
    TargetNodeMatcher,
)
from cartography_spark.store.graphstore import GraphStore


def _seed_graph(spark, store):
    """R -> N -> C chain plus an unconnected node, as raw merges."""
    nodes = spark.createDataFrame(
        [
            ("Region", "r1", {"name": "EUROPE"}),
            ("Nation", "n1", {}),
            ("Customer", "c1", {}),
            ("Customer", "c2", {"inscope": "true"}),
        ],
        "label string, id string, props map<string,string>",
    )
    edges = spark.createDataFrame(
        [
            ("HAS_NATION", "r1", "n1"),
            ("HAS_CUSTOMER", "n1", "c1"),
        ],
        "rel_label string, src string, dst string",
    )
    store.merge_nodes(nodes, 100)
    store.merge_edges(edges, 100)


N1_JSON = json.dumps(
    {
        "name": "exposure analysis",
        "statements": [
            {
                "__comment": "propagate exposure from EUROPE 2 hops",
                "op": "propagate",
                "seed_where": "label = 'Region' AND element_at(props, 'name') = '$SEED'",
                "rel_labels": ["HAS_NATION", "HAS_CUSTOMER"],
                "hops": 2,
                "flag": "exposed",
            },
            {
                "__comment": "tag out-of-scope exposed customers",
                "op": "set_prop",
                "where": "label = 'Customer' AND element_at(props, 'inscope') IS NULL",
                "prop": "foreign",
                "value": "true",
            },
            {
                "__comment": "clear the scratch marker",
                "op": "remove_prop",
                "where": "element_at(props, 'inscope') IS NOT NULL",
                "prop": "inscope",
            },
        ],
    }
)


def test_json_job_matches_code_defined_job(spark, tmp_path):
    """The verdict's done-criterion: the N1 exposure job expressed as a
    JSON file produces byte-identical node output to the code-defined
    job."""
    from cartography_spark.pipeline.analysis import remove_prop_where, set_prop_where

    spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    s_json = GraphStore(spark, str(tmp_path / "gj"))
    s_code = GraphStore(spark, str(tmp_path / "gc"))
    _seed_graph(spark, s_json)
    _seed_graph(spark, s_code)

    AnalysisJob.run_from_json(s_json, N1_JSON, 200, {"SEED": "EUROPE"})

    seed = (F.col("label") == "Region") & (F.element_at("props", "name") == "EUROPE")

    def step1(nodes, edges, params):
        return (
            exposure_propagation(nodes, edges, seed, ["HAS_NATION", "HAS_CUSTOMER"], 2),
            edges,
        )

    def step2(nodes, edges, params):
        pred = (F.col("label") == "Customer") & F.element_at("props", "inscope").isNull()
        return set_prop_where(nodes, pred, "foreign", F.lit("true")), edges

    def step3(nodes, edges, params):
        return (
            remove_prop_where(nodes, F.element_at("props", "inscope").isNotNull(), "inscope"),
            edges,
        )

    job = AnalysisJob("exposure analysis")
    job.add_step("propagate", step1).add_step("tag", step2).add_step("clear", step3)
    job.run(s_code, 200)

    a = s_json.read_nodes().select("label", "id", F.to_json(F.expr("map_entries(props)")).alias("p"))
    b = s_code.read_nodes().select("label", "id", F.to_json(F.expr("map_entries(props)")).alias("p"))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    got = {r["id"]: dict(r["props"]) for r in s_json.read_nodes().collect()}
    assert got["c1"].get("exposed") == "true" and got["c1"].get("foreign") == "true"
    assert got["c2"].get("foreign") is None and "inscope" not in got["c2"]


def test_json_job_per_statement_counters(spark, tmp_path):
    store = GraphStore(spark, str(tmp_path / "g"))
    _seed_graph(spark, store)
    out = AnalysisJob.run_from_json(
        store, N1_JSON, 300, {"SEED": "EUROPE"}, short_name="n1_exposure"
    )
    c = out["counters"]
    assert c["stmt0_matched"] == 1  # one EUROPE seed
    assert c["stmt1_matched"] == 1  # c1 (c2 is inscope)
    assert c["stmt2_matched"] == 1  # c2's scratch marker
    m = store.read_metrics().where("op = 'analysis_n1_exposure'").collect()
    assert len(m) == 1 and m[0]["counters"]["stmt0_matched"] == 1


def test_json_job_unknown_op_rejected(spark):
    blob = json.dumps({"name": "x", "statements": [{"op": "drop_table"}]})
    with pytest.raises(ValueError, match="unknown analysis op"):
        AnalysisJob.from_json(blob)


def test_cli_analysis_job(spark, tmp_path, capsys):
    from cartography_spark.cli import main

    store_dir = str(tmp_path / "g")
    store = GraphStore(spark, store_dir)
    _seed_graph(spark, store)
    job_path = tmp_path / "n1_exposure.json"
    job_path.write_text(N1_JSON)
    rc = main(
        [
            "--cores", "8",
            "analysis",
            "--store", store_dir,
            "--job", str(job_path),
            "--update-tag", "400",
            "--param", "SEED=EUROPE",
        ]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["counters"]["stmt0_matched"] == 1
    got = {r["id"]: dict(r["props"]) for r in store.read_nodes().collect()}
    assert got["c1"].get("exposed") == "true"


def test_analysis_rewrites_only_touched_partitions(spark, tmp_path):
    """Round-3 done-criterion: a set_prop touching one label must
    rewrite ONLY that label's partition — every other partition carries
    forward by manifest reference (same data dir, same seq) — and the
    edge table must not be written at all (the declarative vocabulary
    never touches edges)."""
    store = GraphStore(spark, str(tmp_path / "g"))
    labels = [f"L{i}" for i in range(6)]
    nodes = spark.createDataFrame(
        [(lab, f"{lab}-n{j}", {"x": str(j)}) for lab in labels for j in range(4)],
        "label string, id string, props map<string,string>",
    )
    store.merge_nodes(nodes, 100)
    before_nodes = store._manifest("nodes")["partitions"]
    before_edges_version = store._pointer()["edges"]

    job = AnalysisJob.from_json(
        json.dumps(
            {
                "name": "tag L2",
                "statements": [
                    {
                        "op": "set_prop",
                        "where": "label = 'L2'",
                        "prop": "tagged",
                        "value": "yes",
                    }
                ],
            }
        )
    )
    out = job.run(store, 200)
    assert out["touched_labels"] == ["L2"]

    after = store._manifest("nodes")["partitions"]

    def seqs(entry):
        return {b["seq"] for b in entry["buckets"].values()}

    for lab in labels:
        if lab == "L2":
            assert min(seqs(after[lab])) > max(seqs(before_nodes[lab]))
        else:  # untouched partitions: byte-identical carry-forward
            assert after[lab] == before_nodes[lab]
    # edge table untouched: pointer version unchanged
    assert store._pointer()["edges"] == before_edges_version
    # semantics intact
    rows = {r["id"]: r["props"] for r in store.read_nodes().collect()}
    assert rows["L2-n1"].get("tagged") == "yes"
    assert rows["L3-n1"].get("tagged") is None


def test_propagate_partial_rewrite_with_labeled_edges(spark, tmp_path):
    """Propagate over schema-labeled edges bounds its write set via the
    label graph: labels outside seed∪reach∪carrying carry forward."""
    store = GraphStore(spark, str(tmp_path / "g"))
    nodes = spark.createDataFrame(
        [
            ("Region", "r1", {"name": "EUROPE"}),
            ("Nation", "n1", {}),
            ("Other", "o1", {}),
        ],
        "label string, id string, props map<string,string>",
    )
    edges = spark.createDataFrame(
        [("HAS_NATION", "r1", "n1", "Region", "Nation")],
        "rel_label string, src string, dst string, src_label string, dst_label string",
    )
    store.merge_nodes(nodes, 100)
    store.merge_edges(edges, 100)
    before = store._manifest("nodes")["partitions"]
    out = AnalysisJob.run_from_json(
        store,
        json.dumps(
            {
                "name": "prop",
                "statements": [
                    {
                        "op": "propagate",
                        "seed_where": "label = 'Region' AND element_at(props, 'name') = 'EUROPE'",
                        "rel_labels": ["HAS_NATION"],
                        "hops": 1,
                        "flag": "exposed",
                    }
                ],
            }
        ),
        200,
    )
    assert sorted(out["touched_labels"]) == ["Nation", "Region"]
    after = store._manifest("nodes")["partitions"]
    assert after["Other"] == before["Other"]
    got = {r["id"]: dict(r["props"]) for r in store.read_nodes().collect()}
    assert got["n1"].get("exposed") == "true"
    assert "exposed" not in got["o1"]


DEPENDENT_JSON = json.dumps(
    {
        "name": "seed then propagate",
        "statements": [
            {
                "op": "set_prop",
                "where": "label = 'Region' AND element_at(props, 'name') = 'EUROPE'",
                "prop": "mark",
                "value": "1",
            },
            {
                "op": "propagate",
                "seed_where": "element_at(props, 'mark') = '1'",
                "rel_labels": ["HAS_NATION", "HAS_CUSTOMER"],
                "hops": 2,
                "flag": "exp2",
            },
        ],
    }
)


def test_dependent_propagate_falls_back_to_full_rewrite(spark, tmp_path):
    """Round-4 ADVICE fix: a propagate whose seed_where reads a prop an
    EARLIER statement in the same job writes cannot bound its touched
    set pre-state — the job must fall back to the full rewrite and the
    flag must reach neighbor labels (pre-state derivation would compute
    seed_labels = {} and silently never write them)."""
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    store = GraphStore(spark, str(tmp_path / "gdep"))
    _seed_graph(spark, store)

    job = AnalysisJob.from_json(DEPENDENT_JSON)
    assert job._touched_labels(store.read_nodes(), store.read_edges(), {}) is None

    out = job.run(store, 400)
    assert out["touched_labels"] is None  # full rewrite taken
    got = {r["id"]: dict(r["props"]) for r in store.read_nodes().collect()}
    assert got["r1"].get("exp2") == "true"      # seeded via the NEW mark prop
    assert got["n1"].get("exp2") == "true"      # hop 1
    assert got["c1"].get("exp2") == "true"      # hop 2


def test_independent_statements_keep_partial_path(spark, tmp_path):
    """The N1-style job (propagate first, then predicates reading props
    no earlier statement writes) must STAY on the partial-rewrite path
    after the soundness check."""
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    store = GraphStore(spark, str(tmp_path / "gind"))
    _seed_graph(spark, store)
    # label the edge endpoints (the _seed_graph fixture omits them,
    # which by itself forces the label-graph walk to bail)
    edges = spark.createDataFrame(
        [("HAS_NATION", "r1", "n1", "Region", "Nation"),
         ("HAS_CUSTOMER", "n1", "c1", "Nation", "Customer")],
        "rel_label string, src string, dst string, src_label string, dst_label string",
    )
    store.merge_edges(edges, 100)
    job = AnalysisJob.from_json(N1_JSON)
    touched = job._touched_labels(store.read_nodes(), store.read_edges(), {"SEED": "EUROPE"})
    assert touched is not None and "Customer" in touched


def test_propagate_touched_costs_two_collects(spark, tmp_path):
    """Round-4 fix (VERDICT #9): deriving a propagate statement's
    touched labels costs exactly 2 driver collects — one conditional
    agg for seed+carrying labels, one for the label graph."""
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    store = GraphStore(spark, str(tmp_path / "gcol"))
    _seed_graph(spark, store)
    job = AnalysisJob.from_json(N1_JSON)

    from pyspark.sql import DataFrame

    calls = {"n": 0}
    orig = DataFrame.collect

    def counting(self):
        calls["n"] += 1
        return orig(self)

    DataFrame.collect = counting
    try:
        nodes, edges = store.read_nodes(), store.read_edges()
        calls["n"] = 0
        job.steps[0].touched_fn(nodes, edges, {"SEED": "EUROPE"})
    finally:
        DataFrame.collect = orig
    assert calls["n"] <= 2, f"propagate touched derivation cost {calls['n']} collects"


def test_props_reads_extraction():
    from cartography_spark.pipeline.analysis import _props_reads

    assert _props_reads("label = 'X' AND element_at(props, 'a') = '1'") == {"a"}
    assert _props_reads("props['b'] IS NULL OR map_contains_key(props, 'c')") == {"b", "c"}
    assert _props_reads("label = 'X'") == set()
    # computed key / bare reference: unprovable
    assert _props_reads("element_at(props, lower('A')) = '1'") is None
    assert _props_reads("size(map_keys(props)) > 0") is None


def test_code_step_before_predicate_forces_full_rewrite(spark, tmp_path):
    """Round-5 ADVICE fix: a CODE step (add_step with labels=...) may
    rewrite TOP-LEVEL columns its declaration can't rule out, so any
    later predicate-bearing statement is unsound pre-state even when
    the declared writes_props are disjoint from the predicate's props
    reads — the job must take the conservative full rewrite. The step
    below really does rewrite scope_id, and the propagate's seed reads
    it: the partial path would compute seed_labels pre-state as {} and
    silently never write the flag."""
    import pyspark.sql.functions as F

    spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    store = GraphStore(spark, str(tmp_path / "gcode"))
    _seed_graph(spark, store)

    def retag(nodes, edges, params):
        return (
            nodes.withColumn(
                "scope_id",
                F.when(F.col("label") == "Region", F.lit("hot")).otherwise(
                    F.col("scope_id")
                ),
            ),
            edges,
        )

    job = AnalysisJob("code-then-predicate")
    job.add_step(
        "retag", retag, labels=["Region"], touches_edges=False,
        writes_props=[],  # declares NO props writes — still opaque top-level
    )
    job.steps.append(
        AnalysisJob.from_json(
            json.dumps(
                {
                    "name": "x",
                    "statements": [
                        {
                            "op": "set_prop",
                            "where": "scope_id = 'hot'",
                            "prop": "flagged",
                            "value": "y",
                        }
                    ],
                }
            )
        ).steps[0]
    )
    assert job._touched_labels(store.read_nodes(), store.read_edges(), {}) is None
    out = job.run(store, 500)
    assert out["touched_labels"] is None  # full rewrite taken
    got = {r["id"]: dict(r["props"] or {}) for r in store.read_nodes().collect()}
    assert got["r1"].get("flagged") == "y"  # the write actually landed


def test_code_step_after_statements_keeps_partial_path(spark, tmp_path):
    """The round-5 gate is ordering-sensitive: a labels-declared code
    step AFTER every declarative statement still allows the partial
    path (nothing later reads its writes pre-state)."""
    import pyspark.sql.functions as F

    spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    store = GraphStore(spark, str(tmp_path / "gafter"))
    _seed_graph(spark, store)

    job = AnalysisJob.from_json(
        json.dumps(
            {
                "name": "x",
                "statements": [
                    {
                        "op": "set_prop",
                        "where": "label = 'Region'",
                        "prop": "seen",
                        "value": "1",
                    }
                ],
            }
        )
    )
    job.add_step(
        "post",
        lambda nodes, edges, params: (nodes, edges),
        labels=["Region"],
        touches_edges=False,
    )
    touched = job._touched_labels(store.read_nodes(), store.read_edges(), {})
    assert touched == {"Region"}
