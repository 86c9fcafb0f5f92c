"""Node schema dataclass.

Re-expression of ``cartography/models/core/nodes.py``:
- every node carries ``id`` and engine-managed ``lastupdated``
  (``nodes.py:20-21``); ``firstseen`` is reserved — declaring it is a
  TypeError (``nodes.py:33-38``);
- optional sub-resource (tenant) relationship (``nodes.py:75-87``) which
  stamps the node's ``scope_id`` and drives scoped cleanup;
- ``other_relationships`` (``nodes.py:90-96``), ``extra_node_labels``
  (``nodes.py:99-105``), and the ``scoped_cleanup`` flag defaulting True
  (``nodes.py:107-118``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Mapping, Sequence

from cartography_spark.schema.common import PropertyRef
from cartography_spark.schema.relationships import RelSchema

RESERVED_NODE_PROPS = frozenset({"firstseen", "lastupdated", "label", "extra_labels", "scope_id"})


@dataclass(frozen=True)
class NodeSchema:
    label: str
    properties: Mapping[str, PropertyRef]
    sub_resource_relationship: RelSchema | None = None
    other_relationships: Sequence[RelSchema] = field(default_factory=tuple)
    extra_node_labels: Sequence[str] = field(default_factory=tuple)
    scoped_cleanup: bool = True

    def __post_init__(self) -> None:
        if "id" not in self.properties:
            raise TypeError(f"NodeSchema({self.label}) must declare an 'id' property")
        bad = RESERVED_NODE_PROPS.intersection(self.properties)
        if bad:
            raise TypeError(
                f"NodeSchema({self.label}) may not declare engine-managed "
                f"properties: {sorted(bad)}"
            )

    @property
    def all_relationships(self) -> tuple[RelSchema, ...]:
        rels: list[RelSchema] = []
        if self.sub_resource_relationship is not None:
            rels.append(self.sub_resource_relationship)
        rels.extend(self.other_relationships)
        return tuple(rels)
