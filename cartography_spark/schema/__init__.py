from cartography_spark.schema.common import PropertyRef
from cartography_spark.schema.relationships import (
    LinkDirection,
    MatchLinkSchema,
    RelSchema,
    TargetNodeMatcher,
)
from cartography_spark.schema.nodes import NodeSchema

__all__ = [
    "PropertyRef",
    "LinkDirection",
    "TargetNodeMatcher",
    "RelSchema",
    "MatchLinkSchema",
    "NodeSchema",
]
