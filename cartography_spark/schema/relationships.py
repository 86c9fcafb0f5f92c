"""Relationship schema dataclasses.

Re-expression of ``cartography/models/core/relationships.py``:
- ``LinkDirection`` (``relationships.py:13-36``) only decides which side of
  the edge the freshly-loaded node sits on; the engine normalizes every edge
  to (src, dst) at build time.
- ``TargetNodeMatcher`` (``relationships.py:72-95``) maps target-node property
  keys to :class:`PropertyRef`s on the input row; its modifiers select the
  join variant (exact / lower / contains / explode) in the compiler.
- A standalone "MatchLink" rel (``relationships.py:99-118, 171-184``)
  additionally names and matches its *source* nodes, and requires the
  sub-resource scope props for cleanup (``querybuilder.py:634-643``).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field
from typing import Mapping

from cartography_spark.schema.common import PropertyRef


class LinkDirection(enum.Enum):
    INWARD = "INWARD"
    OUTWARD = "OUTWARD"


@dataclass(frozen=True)
class TargetNodeMatcher:
    """key (target node property name) -> PropertyRef on the input row."""

    keys: Mapping[str, PropertyRef]

    def __post_init__(self) -> None:
        if not self.keys:
            raise ValueError("TargetNodeMatcher requires at least one key")


RESERVED_REL_PROPS = frozenset({"firstseen", "lastupdated"})


def _validate_props(props: Mapping[str, PropertyRef], what: str) -> None:
    # Engine-managed fields may not be declared (reference raises TypeError
    # for firstseen at models/core/relationships.py:64-69 / nodes.py:33-38).
    bad = RESERVED_REL_PROPS.intersection(props)
    if bad:
        raise TypeError(f"{what} may not declare engine-managed properties: {sorted(bad)}")


@dataclass(frozen=True)
class RelSchema:
    rel_label: str
    target_node_label: str
    target_node_matcher: TargetNodeMatcher
    direction: LinkDirection = LinkDirection.OUTWARD
    properties: Mapping[str, PropertyRef] = field(default_factory=dict)

    def __post_init__(self) -> None:
        _validate_props(self.properties, f"RelSchema({self.rel_label})")


@dataclass(frozen=True)
class MatchLinkSchema:
    """Standalone rel between two already-loaded node sets (J7).

    Reference: ``querybuilder.py:616-684`` (``build_matchlink_query``) and its
    loader ``client/core/tx.py:306-340`` — both endpoint matches are MATCH
    (not MERGE), so rows missing either endpoint are dropped; the engine
    expresses that as two inner joins.
    """

    rel_label: str
    source_node_label: str
    source_node_matcher: TargetNodeMatcher
    target_node_label: str
    target_node_matcher: TargetNodeMatcher
    direction: LinkDirection = LinkDirection.OUTWARD
    properties: Mapping[str, PropertyRef] = field(default_factory=dict)

    def __post_init__(self) -> None:
        _validate_props(self.properties, f"MatchLinkSchema({self.rel_label})")
