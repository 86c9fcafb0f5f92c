"""Property-based tests for declarative analysis jobs.

For ANY sequence of set_prop/remove_prop statements over ANY seeded
node set, the partial-rewrite job (touched-label derivation, only
those partitions rewritten, one atomic commit) must leave the store in
exactly the state an independent Python model computes by applying the
statements sequentially — i.e. the partial rewrite is semantically
invisible."""

from __future__ import annotations

import json

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cartography_spark.pipeline.analysis import AnalysisJob
from cartography_spark.store.graphstore import GraphStore

LABELS = ["L0", "L1", "L2"]
KEYS = ["p", "q"]
VALS = ["1", "2"]

nodes_strategy = st.dictionaries(
    st.tuples(st.sampled_from(LABELS), st.sampled_from(["a", "b", "c"])),
    st.dictionaries(st.sampled_from(KEYS), st.sampled_from(VALS), max_size=2),
    min_size=1,
    max_size=6,
)


def _pred(kind, label, key, val):
    if kind == "by_label":
        return f"label = '{label}'"
    if kind == "by_prop":
        return f"element_at(props, '{key}') = '{val}'"
    return f"label = '{label}' AND element_at(props, '{key}') IS NULL"


stmt_strategy = st.builds(
    lambda op, kind, label, key, val, prop, value: {
        "op": op,
        "where": _pred(kind, label, key, val),
        "prop": prop,
        **({"value": value} if op == "set_prop" else {}),
    },
    op=st.sampled_from(["set_prop", "remove_prop"]),
    kind=st.sampled_from(["by_label", "by_prop", "by_prop_null"]),
    label=st.sampled_from(LABELS),
    key=st.sampled_from(KEYS),
    val=st.sampled_from(VALS),
    prop=st.sampled_from(KEYS + ["tag"]),
    value=st.sampled_from(VALS + ["x"]),
)


def _model_matches(props: dict, where: str) -> bool:
    # mirror of _pred's three shapes
    if " AND " in where:
        lab = where.split("'")[1]
        key = where.split("element_at(props, '")[1].split("'")[0]
        return props["__label"] == lab and key not in props
    if where.startswith("label"):
        return props["__label"] == where.split("'")[1]
    key = where.split("'")[1]
    val = where.split("'")[3]
    return props.get(key) == val


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(nodes=nodes_strategy, stmts=st.lists(stmt_strategy, min_size=1, max_size=3))
def test_partial_rewrite_job_matches_python_model(spark, tmp_path_factory, nodes, stmts):
    store = GraphStore(spark, str(tmp_path_factory.mktemp("g")))
    rows = [(lab, nid, dict(p)) for (lab, nid), p in nodes.items()]
    store.merge_nodes(
        spark.createDataFrame(rows, "label string, id string, props map<string,string>"),
        100,
    )

    # independent model
    model = {
        (lab, nid): dict(p, __label=lab) for (lab, nid), p in nodes.items()
    }
    for s in stmts:
        for k, props in model.items():
            if _model_matches(props, s["where"]):
                if s["op"] == "set_prop":
                    props[s["prop"]] = s["value"]
                else:
                    props.pop(s["prop"], None)

    job = AnalysisJob.from_json(json.dumps({"name": "prop test", "statements": stmts}))
    out = job.run(store, 200)
    # Partial path engages iff every statement's predicate is provably
    # independent of earlier statements' writes (round 4: a dependent
    # predicate evaluated pre-state would under-scope the touched set,
    # so the engine must fall back to the full rewrite for those).
    from cartography_spark.pipeline.analysis import _props_reads

    written: set = set()
    expect_partial = True
    for i, s in enumerate(stmts):
        if i > 0:
            reads = _props_reads(s["where"])
            if reads is None or (reads & written):
                expect_partial = False
                break
        written.add(s["prop"])
    if expect_partial:
        assert out["touched_labels"] is not None  # partial path engaged
    else:
        assert out["touched_labels"] is None  # conservative full rewrite

    got = {
        (r["label"], r["id"]): dict(r["props"] or {})
        for r in store.read_nodes().collect()
    }
    want = {
        k: {kk: vv for kk, vv in p.items() if kk != "__label"}
        for k, p in model.items()
    }
    assert got == want
