"""Property-based tests (hypothesis) for the MERGE plan invariants.

For ANY sequence of update batches, the store must satisfy:
- firstseen(id) == tag of the FIRST batch that contained the id;
- lastupdated(id) == tag of the LAST batch that contained the id;
- props(id) == union of all batches' props with later batches winning
  per key (LAST_WIN), never losing untouched keys;
- exactly one row per (label, id).

A driver-side Python model computes the expected state; the Spark
store must match it exactly (the reference asserts the same contract
example-wise in its two-run integration tests; hypothesis generalizes
it to arbitrary run sequences).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cartography_spark.store.graphstore import GraphStore

ids = st.sampled_from(["a", "b", "c", "d"])
props = st.dictionaries(
    st.sampled_from(["p", "q", "r"]), st.sampled_from(["1", "2", "x"]), max_size=3
)
# unique ids per batch: intra-batch duplicate resolution is covered
# deterministically by test_store_merge.py::test_merge_is_idempotent_under_retry
batch = st.dictionaries(ids, props, min_size=1, max_size=4)
batches = st.lists(batch, min_size=1, max_size=4)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(batches=batches, n_buckets=st.sampled_from([1, 2, 16]))
def test_merge_matches_python_model(spark, tmp_path_factory, batches, n_buckets):
    # n_buckets drawn too (round 5): 1 = single-bucket (whole-partition
    # rewrite degenerate case), 2 = forced key collisions per bucket,
    # 16 = default sparse layout — the MERGE contract must hold at any
    # bucketing, since buckets only change the rewrite unit.
    store = GraphStore(spark, str(tmp_path_factory.mktemp("g")), n_buckets=n_buckets)
    model: dict[str, dict] = {}
    for i, b in enumerate(batches):
        tag = 100 + i
        rows = [("T", nid, None, p) for nid, p in b.items()]
        df = spark.createDataFrame(
            rows, "label string, id string, scope_id string, props map<string,string>"
        )
        store.merge_nodes(df, tag)
        for nid, p in b.items():
            if nid not in model:
                model[nid] = {"firstseen": tag, "props": {}}
            model[nid]["lastupdated"] = tag
            model[nid]["props"].update(p)

    got = {
        r["id"]: r
        for r in store.read_nodes().where("label = 'T'").collect()
    }
    assert set(got) == set(model)
    for nid, m in model.items():
        r = got[nid]
        assert int(r["firstseen"].timestamp()) == m["firstseen"], nid
        assert r["lastupdated"] == m["lastupdated"], nid
        assert dict(r["props"] or {}) == m["props"], nid


# Promoted-column invariants: for ANY batch sequence where batches may
# or may not carry the promoted property, the stored ``_p_`` value
# equals the LAST non-null value any batch supplied — because the
# write path derives the promoted copy from the merged props map
# (props is the single source of truth; the compiler always writes the
# property to both), and props merge is LAST_WIN.
pbatch = st.dictionaries(
    ids,
    st.tuples(props, st.one_of(st.none(), st.sampled_from(["e1", "e2", "e3"]))),
    min_size=1,
    max_size=4,
)
pbatches = st.lists(pbatch, min_size=1, max_size=4)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(batches=pbatches, n_buckets=st.sampled_from([2, 16]))
def test_promoted_column_matches_python_model(spark, tmp_path_factory, batches, n_buckets):
    store = GraphStore(spark, str(tmp_path_factory.mktemp("g")), n_buckets=n_buckets)
    model: dict[str, str | None] = {}
    for i, b in enumerate(batches):
        tag = 100 + i
        with_col = {nid: pe for nid, pe in b.items() if pe[1] is not None}
        without = {nid: pe for nid, pe in b.items() if pe[1] is None}
        # batches lacking the promoted value entirely omit the column
        # (schema evolution both directions)
        if with_col:
            df = spark.createDataFrame(
                [("T", nid, {**p, "email": e}, e) for nid, (p, e) in with_col.items()],
                "label string, id string, props map<string,string>, _p_email string",
            )
            store.merge_nodes(df, tag)
        if without:
            df = spark.createDataFrame(
                [("T", nid, p) for nid, (p, _) in without.items()],
                "label string, id string, props map<string,string>",
            )
            store.merge_nodes(df, tag)
        for nid, (_, e) in b.items():
            model.setdefault(nid, None)
            if e is not None:
                model[nid] = e
    got = {
        r["id"]: r["_p_email"] if "_p_email" in store.read_nodes().columns else None
        for r in store.read_nodes().collect()
    }
    assert got == model
