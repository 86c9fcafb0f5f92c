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


def _entry_seqs(entry):
    return {b["seq"] for b in entry["buckets"].values()}


def test_merge_rewrites_only_touched_partitions(spark, store):
    """The Iceberg-style partial-rewrite contract: merging label B must
    carry label A's data directories forward BY REFERENCE (identical
    bucket entries in the manifest), so merge cost is proportional to
    touched partitions, not table size."""
    store.merge_nodes(_nodes_df(spark, [("A", f"a{i}", None, {}) for i in range(50)]), 1)
    man1 = store._manifest("nodes")
    a_before = man1["partitions"]["A"]
    store.merge_nodes(_nodes_df(spark, [("B", "b1", None, {})]), 2)
    man2 = store._manifest("nodes")
    assert man2["partitions"]["A"] == a_before  # untouched: zero copy
    assert min(_entry_seqs(man2["partitions"]["B"])) > max(_entry_seqs(a_before))
    ids = {r["id"] for r in store.read_nodes().collect()}
    assert len(ids) == 51 and "b1" in ids


def test_sweep_is_merge_on_read_no_data_rewrite(spark, store):
    """sweep() must write only tombstone key files — every data
    directory of the pre-sweep manifest survives untouched."""
    import os

    from cartography_spark.schema import (
        LinkDirection,
        NodeSchema,
        PropertyRef,
        RelSchema,
        TargetNodeMatcher,
    )
    from cartography_spark.pipeline.sync import load

    tenant = NodeSchema(label="Tenant", properties={"id": PropertyRef("tid")})
    user = NodeSchema(
        label="User",
        properties={"id": PropertyRef("uid")},
        sub_resource_relationship=RelSchema(
            rel_label="RESOURCE",
            target_node_label="Tenant",
            target_node_matcher=TargetNodeMatcher(
                {"id": PropertyRef("TENANT_ID", set_in_kwargs=True)}
            ),
            direction=LinkDirection.INWARD,
        ),
    )
    load(store, tenant, spark.createDataFrame([("t1",)], "tid string"), 1)
    load(store, user, spark.createDataFrame([("u1",), ("u2",)], "uid string"), 100, TENANT_ID="t1")
    man_before = store._manifest("nodes")
    load(store, user, spark.createDataFrame([("u1",)], "uid string"), 200, TENANT_ID="t1")
    man_mid = store._manifest("nodes")
    c = store.sweep(user, 200, scope_id="t1")
    assert c["nodes_deleted"] == 1 and c["edges_deleted"] == 1
    man_after = store._manifest("nodes")
    # data dirs identical to pre-sweep; only a delete entry was added
    assert man_after["partitions"] == man_mid["partitions"]
    assert len(man_after["deletes"]) == 1
    assert {r["id"] for r in store.read_nodes().where("label='User'").collect()} == {"u1"}
    # recreate u2: fresh firstseen, and the old tombstone must NOT
    # re-delete it (sequence-number semantics: delete < new data seq)
    load(store, user, spark.createDataFrame([("u2",)], "uid string"), 300, TENANT_ID="t1")
    rows = {r["id"]: r for r in store.read_nodes().where("label='User'").collect()}
    assert set(rows) == {"u1", "u2"}
    assert int(rows["u2"]["firstseen"].timestamp()) == 300


def test_sweep_keeps_null_scoped_rows(spark, store):
    """NULL scope_id / lastupdated rows never match a stale predicate:
    they are KEPT (Cypher <> null semantics), not silently dropped."""
    from cartography_spark.schema import (
        LinkDirection,
        NodeSchema,
        PropertyRef,
        RelSchema,
        TargetNodeMatcher,
    )

    user = NodeSchema(
        label="User",
        properties={"id": PropertyRef("uid")},
        sub_resource_relationship=RelSchema(
            rel_label="RESOURCE",
            target_node_label="Tenant",
            target_node_matcher=TargetNodeMatcher(
                {"id": PropertyRef("TENANT_ID", set_in_kwargs=True)}
            ),
            direction=LinkDirection.INWARD,
        ),
    )
    nodes = spark.createDataFrame(
        [
            ("User", "n_null_scope", None, None, {}),
            ("User", "stale", "t1", 100, {}),
        ],
        "label string, id string, scope_id string, lastupdated long, props map<string,string>",
    )
    store.merge_nodes(nodes.drop("lastupdated"), 100)
    c = store.sweep(user, 999, scope_id="t1")
    ids = {r["id"] for r in store.read_nodes().collect()}
    assert "n_null_scope" in ids  # NULL scope: kept, not silently deleted
    assert c["nodes_deleted"] == 1 and "stale" not in ids


def test_compact_folds_tombstones(spark, store):
    store.merge_nodes(_nodes_df(spark, [("A", "a1", "s", {}), ("A", "a2", "s", {})]), 1)
    # tombstone a2 directly via the delete path
    from pyspark.sql import functions as F

    doomed = store.read_nodes().where("id='a2'").select("label", "id")
    n, _ = store._write_deletes("nodes", doomed)
    assert n == 1
    before = {r["id"] for r in store.read_nodes().collect()}
    store.compact("nodes")
    after = {r["id"] for r in store.read_nodes().collect()}
    assert before == after == {"a1"}
    assert store._manifest("nodes")["deletes"] == []


def test_manifest_partition_lineage(spark, store):
    store.merge_nodes(_nodes_df(spark, [("A", "a1", None, {}), ("B", "b1", None, {})]), 1)
    man = store._manifest("nodes")
    assert man["bucket_count"] == store.n_buckets
    for pval in ("A", "B"):
        entry = man["partitions"][pval]
        assert entry["buckets"]  # per-(partition, bucket) lineage
        for b, binfo in entry["buckets"].items():
            assert 0 <= int(b) < store.n_buckets
            assert binfo["files"] >= 1 and binfo["bytes"] > 0
            assert binfo["seq"] == int(store._pointer()["nodes"][1:])


def test_expire_versions_gc(spark, store):
    import os

    for tag in (1, 2, 3, 4, 5):
        store.merge_nodes(_nodes_df(spark, [("X", f"x{tag}", None, {})]), tag)
    assert len(store.node_versions()) == 5
    removed = store.expire_versions(keep_last=2)
    assert len(removed["nodes"]) == 3
    versions = store.node_versions()
    assert len(versions) == 2
    # current still reads fine; retained time travel works
    assert store.read_nodes().count() == 5
    assert store.read_nodes(version=versions[0]).count() == 4
    # unreferenced data dirs are gone, referenced ones survive
    data_dirs = set(os.listdir(os.path.join(store.root, "data", "nodes")))
    referenced = {
        b["dir"].split("/")[2]
        for v in versions
        for p in store._manifest("nodes", v)["partitions"].values()
        for b in p["buckets"].values()
    }
    assert data_dirs == referenced


def test_sweep_twice_is_idempotent(spark, store):
    from cartography_spark.pipeline.sync import load
    from cartography_spark.schema import (
        LinkDirection,
        NodeSchema,
        PropertyRef,
        RelSchema,
        TargetNodeMatcher,
    )

    tenant = NodeSchema(label="Tenant", properties={"id": PropertyRef("tid")})
    user = NodeSchema(
        label="User",
        properties={"id": PropertyRef("uid")},
        sub_resource_relationship=RelSchema(
            rel_label="RESOURCE",
            target_node_label="Tenant",
            target_node_matcher=TargetNodeMatcher(
                {"id": PropertyRef("TENANT_ID", set_in_kwargs=True)}
            ),
            direction=LinkDirection.INWARD,
        ),
    )
    load(store, tenant, spark.createDataFrame([("t1",)], "tid string"), 1)
    load(store, user, spark.createDataFrame([("u1",), ("u2",)], "uid string"), 100, TENANT_ID="t1")
    load(store, user, spark.createDataFrame([("u1",)], "uid string"), 200, TENANT_ID="t1")
    c1 = store.sweep(user, 200, scope_id="t1")
    assert c1["nodes_deleted"] == 1
    # tombstoned rows are gone from reads, so a second sweep dooms nothing
    c2 = store.sweep(user, 200, scope_id="t1")
    assert c2 == {"nodes_deleted": 0, "edges_deleted": 0}
    assert {r["id"] for r in store.read_nodes().where("label='User'").collect()} == {"u1"}


def test_drift_sees_tombstoned_rows(spark, store):
    """Version time travel must cross merge-on-read deletes: a version
    captured BEFORE a sweep still shows the later-tombstoned rows, and
    node_drift between the versions reports them as removed."""
    from cartography_spark.operators.drift import node_drift
    from cartography_spark.pipeline.sync import load
    from cartography_spark.schema import (
        LinkDirection,
        NodeSchema,
        PropertyRef,
        RelSchema,
        TargetNodeMatcher,
    )

    tenant = NodeSchema(label="Tenant", properties={"id": PropertyRef("tid")})
    user = NodeSchema(
        label="User",
        properties={"id": PropertyRef("uid")},
        sub_resource_relationship=RelSchema(
            rel_label="RESOURCE",
            target_node_label="Tenant",
            target_node_matcher=TargetNodeMatcher(
                {"id": PropertyRef("TENANT_ID", set_in_kwargs=True)}
            ),
            direction=LinkDirection.INWARD,
        ),
    )
    load(store, tenant, spark.createDataFrame([("t1",)], "tid string"), 1)
    load(store, user, spark.createDataFrame([("u1",), ("u2",)], "uid string"), 100, TENANT_ID="t1")
    v_before = store._pointer()["nodes"]
    load(store, user, spark.createDataFrame([("u1",)], "uid string"), 200, TENANT_ID="t1")
    store.sweep(user, 200, scope_id="t1")
    assert store.read_nodes(version=v_before).where("label='User'").count() == 2
    drift = {(r["id"], r["change"]) for r in node_drift(store, v_before, label="User").collect()}
    assert drift == {("u2", "removed")}


def test_maybe_compact_bounds_tombstones(spark, store):
    store.merge_nodes(
        _nodes_df(spark, [("A", f"a{i}", None, {}) for i in range(12)]), 1
    )
    for i in range(10):
        doomed = store.read_nodes().where(f"id='a{i}'").select("label", "id")
        store._write_deletes("nodes", doomed)
    assert len(store._manifest("nodes")["deletes"]) == 10
    assert store.maybe_compact(max_delete_files=8) != {}
    assert store._manifest("nodes")["deletes"] == []
    assert store.read_nodes().count() == 2
    # under the threshold: no-op
    assert store.maybe_compact(max_delete_files=8) == {}


def test_merge_after_compact(spark, store):
    store.merge_nodes(_nodes_df(spark, [("A", "a1", None, {"k": "1"})]), 1)
    doomed = store.read_nodes().where("id='a1'").select("label", "id")
    store._write_deletes("nodes", doomed)
    store.compact("nodes")
    r = store.merge_nodes(_nodes_df(spark, [("A", "a1", None, {"k": "2"})]), 2)
    assert r["created"] == 1  # a1 was deleted+compacted away -> fresh create
    rows = store.read_nodes().collect()
    assert len(rows) == 1 and rows[0]["props"]["k"] == "2"
    assert int(rows[0]["firstseen"].timestamp()) == 2


def test_cli_store_compact_and_expire(spark, tmp_path, capsys):
    import json as _json

    from cartography_spark.cli import main

    root = str(tmp_path / "g")
    store = GraphStore(spark, root)
    for tag in (1, 2, 3, 4):
        store.merge_nodes(_nodes_df(spark, [("X", f"x{tag}", None, {})]), tag)
    assert main(["--cores", "8", "store", "compact", "--store", root]) == 0
    assert main(["--cores", "8", "store", "expire", "--store", root, "--keep-last", "2"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert "nodes" in _json.loads(out[-1])
    assert len(GraphStore(spark, root).node_versions()) == 2
    assert GraphStore(spark, root).read_nodes().count() == 4


def test_merge_single_pass_counters(spark, store):
    """Counters fold into the write pass via Observation: a merge runs a
    bounded number of Spark jobs (touched-partition collect + write +
    metrics append) — no extra anti-join/count jobs."""
    store.merge_nodes(_nodes_df(spark, [("P", "p1", None, {})]), 1)
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    # AQE materializes each shuffle stage as its own job, which would
    # make a raw job count meaningless; with it off, one action = one
    # job, so the count below pins "no extra anti-join/count passes".
    aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        sc.setJobGroup("merge-job-count", "count jobs in one merge")
        r = store.merge_nodes(
            _nodes_df(spark, [("P", "p1", None, {}), ("P", "p2", None, {})]), 2
        )
        jobs = tracker.getJobIdsForGroup("merge-job-count")
    finally:
        sc.setJobGroup(None, None)
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
    assert r["created"] == 1 and r["updated"] == 1
    # touched-partition collect + merged write + metrics append
    assert len(jobs) <= 4


def test_expire_versions_never_dooms_current(spark, store):
    """keep_last is clamped to >= 1: even keep_last=0 (reachable from the
    CLI) must retain the CURRENT manifest and its data."""
    store.merge_nodes(_nodes_df(spark, [("P", "p1", "s1", {"a": "1"})]), 100)
    store.merge_nodes(_nodes_df(spark, [("P", "p2", "s1", {"a": "2"})]), 200)
    store.expire_versions(keep_last=0)
    assert sorted(r["id"] for r in store.read_nodes().collect()) == ["p1", "p2"]
    assert len(store.node_versions()) == 1


def test_read_cost_bounded_across_twenty_sweeps(spark, store):
    """Round-3 done-criterion for tombstone debt: each delete file adds
    an anti-join to reads, so 20 sweep rounds with maybe_compact in the
    loop (as the CLI sync runs it) must keep the manifest's tombstone
    count — and therefore the read plan — bounded, with reads staying
    correct throughout."""
    store.merge_nodes(
        _nodes_df(spark, [("A", f"a{i}", None, {}) for i in range(30)]), 1
    )
    for i in range(20):
        doomed = store.read_nodes().where(f"id='a{i}'").select("label", "id")
        store._write_deletes("nodes", doomed)
        store.maybe_compact(max_delete_files=4)
    assert len(store._manifest("nodes")["deletes"]) <= 4
    rows = sorted(r["id"] for r in store.read_nodes().collect())
    assert rows == sorted(f"a{i}" for i in range(20, 30))
    # plan shape: bounded number of anti-joins folded into the read
    plan = store.read_nodes()._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LeftAnti") <= 5


def test_merge_plan_is_broadcastable_no_full_outer(spark, store):
    """100 TB plan-shape pin: the MERGE must not plan a FULL OUTER join
    (Spark can never broadcast one — the stored side would shuffle every
    sync). With a small update batch the update-in-place pass must be a
    BroadcastHashJoin, so stored rows flow scan -> join -> write with no
    shuffle of the stored table."""
    from pyspark.sql import functions as F

    from cartography_spark.store.graphstore import NODES_SCHEMA, merge_frames

    store.merge_nodes(
        _nodes_df(spark, [("T", f"t{i}", None, {"k": str(i)}) for i in range(500)]), 100
    )
    new = _nodes_df(spark, [("T", "t1", None, {"k": "x"}), ("T", "t_new", None, {})])
    for f in NODES_SCHEMA.fields:
        if f.name not in new.columns and f.name not in ("firstseen", "lastupdated"):
            new = new.withColumn(f.name, F.lit(None).cast(f.dataType))
    cols = [f.name for f in NODES_SCHEMA.fields]
    plan = (
        merge_frames(store.read_nodes(), new, ["label", "id"], cols, 200)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "FullOuter" not in plan
    assert "BroadcastHashJoin" in plan and "LeftOuter" in plan


def test_compact_is_bucket_scoped(spark, store):
    """100 TB compaction shape: only tombstone-affected BUCKETS are
    rewritten; untouched partitions — and untouched buckets of the
    touched partition — carry forward byte-identically, and dead
    tombstones are pruned from the manifest."""
    store.merge_nodes(
        _nodes_df(
            spark,
            [("A", f"a{i}", None, {}) for i in range(5)]
            + [("B", "b1", None, {})]
            + [("C", "c1", None, {})],
        ),
        100,
    )
    doomed = store.read_nodes().where("label = 'A' AND id = 'a0'").select("label", "id")
    store._write_deletes("nodes", doomed)
    man = store._manifest("nodes")
    assert man["deletes"] and man["deletes"][0]["partitions"] == ["A"]
    tomb_buckets = set(man["deletes"][0]["buckets"]["A"])
    before = dict(man["partitions"])
    store.compact("nodes")
    after = store._manifest("nodes")
    # only a0's bucket rewritten at a fresh seq; every other bucket of A
    # — and B, C entirely — carried forward by reference
    for b, binfo in after["partitions"]["A"]["buckets"].items():
        if int(b) in tomb_buckets:
            assert binfo["seq"] > max(_entry_seqs(before["A"]))
        else:
            assert binfo == before["A"]["buckets"][b]
    assert after["partitions"]["B"] == before["B"]
    assert after["partitions"]["C"] == before["C"]
    assert after["deletes"] == []
    ids = sorted(r["id"] for r in store.read_nodes().collect())
    assert ids == ["a1", "a2", "a3", "a4", "b1", "c1"]


def test_compact_prunes_dead_tombstones_without_rewrite(spark, store):
    """A tombstone whose buckets were all since rewritten by merges
    applies to nothing: compact drops it from the manifest WITHOUT
    touching any data."""
    store.merge_nodes(
        _nodes_df(spark, [("A", "a1", None, {}), ("B", "b1", None, {})]), 100
    )
    doomed = store.read_nodes().where("id = 'a1'").select("label", "id")
    store._write_deletes("nodes", doomed)
    # re-merging key a1 rewrites ITS bucket at a newer seq: the
    # tombstone now applies to no older-seq bucket in its scope (and by
    # sequence-number semantics the re-merged a1 is not re-deleted)
    store.merge_nodes(_nodes_df(spark, [("A", "a1", None, {})]), 200)
    before = dict(store._manifest("nodes")["partitions"])
    store.compact("nodes")
    after = store._manifest("nodes")
    assert after["deletes"] == []
    assert after["partitions"] == before  # no data rewritten
    ids = sorted(r["id"] for r in store.read_nodes().collect())
    assert ids == ["a1", "b1"]


def test_compact_full_snapshot_still_available(spark, store):
    """full=True keeps the legacy whole-table snapshot (re-sorts and
    re-homes every partition at one seq)."""
    store.merge_nodes(_nodes_df(spark, [("A", "a1", None, {})]), 100)
    store.merge_nodes(_nodes_df(spark, [("B", "b1", None, {})]), 200)
    out = store.compact("nodes", full=True)
    man = store._manifest("nodes")
    seqs = {s for info in man["partitions"].values() for s in _entry_seqs(info)}
    assert len(seqs) == 1 and out["nodes"].startswith("v")
    assert store.read_nodes().count() == 2


def test_merge_rejects_null_key_columns(spark, store):
    """NULL merge keys are rejected loudly: a NULL key never
    equi-matches (endless create-pass duplicates, undeletable rows) and
    a NULL partition value would silently REPLACE the
    __HIVE_DEFAULT_PARTITION__ manifest entries, losing stored rows.
    The reference errors the same way (Cypher MERGE on null property)."""
    store.merge_nodes(_nodes_df(spark, [("T", "t1", None, {})]), 100)
    with pytest.raises(ValueError, match="NULL.*merge-key"):
        store.merge_nodes(_nodes_df(spark, [(None, "x", None, {})]), 200)
    with pytest.raises(ValueError, match="NULL.*merge-key"):
        store.merge_nodes(_nodes_df(spark, [("T", None, None, {})]), 200)
    # the rejected batches left no trace
    assert store.read_nodes().count() == 1


def test_merge_frames_props_overwrite_is_policy_independent(spark, store):
    """merge_frames is exported for standalone plan reuse, so its
    new-wins props merge must hold under ANY mapKeyDedupPolicy — not
    just the LAST_WIN conf GraphStore.__init__ happens to set. Under
    the Spark default (EXCEPTION) a naive map_concat would throw
    'duplicate map key' on every updated prop."""
    from pyspark.sql import functions as F

    from cartography_spark.store.graphstore import NODES_SCHEMA, merge_frames

    store.merge_nodes(
        _nodes_df(spark, [("T", "t1", None, {"k": "old", "keep": "1"})]), 100
    )
    new = _nodes_df(spark, [("T", "t1", None, {"k": "new", "added": "2"})])
    for f in NODES_SCHEMA.fields:
        if f.name not in new.columns and f.name not in ("firstseen", "lastupdated"):
            new = new.withColumn(f.name, F.lit(None).cast(f.dataType))
    cols = [f.name for f in NODES_SCHEMA.fields]
    prev = spark.conf.get("spark.sql.mapKeyDedupPolicy")
    try:
        spark.conf.set("spark.sql.mapKeyDedupPolicy", "EXCEPTION")
        rows = merge_frames(
            store.read_nodes(), new, ["label", "id"], cols, 200
        ).collect()
    finally:
        spark.conf.set("spark.sql.mapKeyDedupPolicy", prev)
    assert len(rows) == 1
    props = dict(rows[0]["props"])
    assert props == {"k": "new", "keep": "1", "added": "2"}
