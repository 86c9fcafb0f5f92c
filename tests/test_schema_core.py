"""Schema dataclass validation — mirrors the reference's contract errors
(``models/core/nodes.py:33-38``, ``relationships.py:64-69``,
``models/core/common.py`` invalid-combination guards)."""

import pytest

from cartography_spark.schema import (
    LinkDirection,
    MatchLinkSchema,
    NodeSchema,
    PropertyRef,
    RelSchema,
    TargetNodeMatcher,
)


def test_node_schema_requires_id():
    with pytest.raises(TypeError, match="'id'"):
        NodeSchema(label="X", properties={"name": PropertyRef("name")})


def test_node_schema_rejects_reserved_props():
    for bad in ("firstseen", "lastupdated"):
        with pytest.raises(TypeError, match="engine-managed"):
            NodeSchema(label="X", properties={"id": PropertyRef("id"), bad: PropertyRef(bad)})


def test_rel_schema_rejects_reserved_props():
    with pytest.raises(TypeError, match="engine-managed"):
        RelSchema(
            rel_label="R",
            target_node_label="T",
            target_node_matcher=TargetNodeMatcher({"id": PropertyRef("tid")}),
            properties={"firstseen": PropertyRef("x")},
        )


def test_matcher_requires_keys():
    with pytest.raises(ValueError):
        TargetNodeMatcher({})


def test_propertyref_invalid_combinations():
    with pytest.raises(ValueError):
        PropertyRef("x", one_to_many=True, set_in_kwargs=True)
    with pytest.raises(ValueError):
        PropertyRef("x", one_to_many=True, fuzzy_and_ignore_case=True)
    with pytest.raises(ValueError, match="extra_index"):
        PropertyRef("x", index_type="bigint")
    with pytest.raises(ValueError, match="string-typed"):
        PropertyRef("x", extra_index=True, index_type="bigint", ignore_case=True)
    # string-typed promotion composes with case-insensitive matching
    PropertyRef("x", extra_index=True, index_type="string", ignore_case=True)


def test_propertyref_kwarg_binding_requires_param():
    ref = PropertyRef("tag", set_in_kwargs=True)
    with pytest.raises(KeyError):
        ref.to_column({})


def test_all_relationships_ordering():
    sub = RelSchema(
        rel_label="RESOURCE",
        target_node_label="Tenant",
        target_node_matcher=TargetNodeMatcher({"id": PropertyRef("TENANT_ID", set_in_kwargs=True)}),
        direction=LinkDirection.INWARD,
    )
    other = RelSchema(
        rel_label="KNOWS",
        target_node_label="X",
        target_node_matcher=TargetNodeMatcher({"id": PropertyRef("xid")}),
    )
    s = NodeSchema(
        label="N",
        properties={"id": PropertyRef("id")},
        sub_resource_relationship=sub,
        other_relationships=(other,),
    )
    assert s.all_relationships == (sub, other)


def test_matchlink_schema_validates():
    with pytest.raises(TypeError, match="engine-managed"):
        MatchLinkSchema(
            rel_label="L",
            source_node_label="A",
            source_node_matcher=TargetNodeMatcher({"id": PropertyRef("a")}),
            target_node_label="B",
            target_node_matcher=TargetNodeMatcher({"id": PropertyRef("b")}),
            properties={"lastupdated": PropertyRef("x")},
        )


def test_extra_node_labels_flow_to_store(spark, tmp_path):
    """extra_node_labels (the reference's secondary Cypher labels,
    models/core/nodes.py) land in the store's extra_labels column and
    are queryable with array_contains — the MATCH (n:Extra) analog."""
    from pyspark.sql import functions as F

    from cartography_spark.pipeline.sync import load
    from cartography_spark.schema import NodeSchema, PropertyRef
    from cartography_spark.store.graphstore import GraphStore

    schema = NodeSchema(
        label="Host",
        properties={"id": PropertyRef("hid")},
        extra_node_labels=("Asset", "Computer"),
    )
    store = GraphStore(spark, str(tmp_path / "g"))
    load(store, schema, spark.createDataFrame([("h1",)], "hid string"), 100)
    rows = store.read_nodes().where(
        F.array_contains("extra_labels", "Asset")
    ).collect()
    assert [r["id"] for r in rows] == ["h1"]
    assert list(rows[0]["extra_labels"]) == ["Asset", "Computer"]


def test_matcher_precedence_ignorecase_before_one_to_many(spark):
    """The reference's elif chain (``querybuilder.py:147-163``) checks
    ``ignore_case`` BEFORE ``one_to_many``: both flags set resolves to a
    case-insensitive SCALAR equality match, not a list-membership join.
    An item whose field is the scalar string 'ALPHA' must match target
    key 'alpha'; no explode happens."""
    from cartography_spark.operators.linking import matcher_join
    from cartography_spark.schema.common import PropertyRef

    items = spark.createDataFrame([("i1", "ALPHA")], "item_id string, ref string")
    targets = spark.createDataFrame(
        [("alpha", "t1"), ("beta", "t2")], "key string, tid string"
    )
    ref = PropertyRef("ref", ignore_case=True, one_to_many=True)
    got = matcher_join(items, targets, {"key": ref}).collect()
    assert len(got) == 1 and got[0]["__t_tid"] == "t1"
