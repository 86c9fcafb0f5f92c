"""Wildcard-policy predicate evaluation (reference T5/J6).

The reference compiles IAM-style wildcard patterns (``*`` any run,
``?`` one char) to regexes and evaluates principal policies against
resource identifiers (``cartography/intel/aws/permission_relationships
.py:21-34, 225-251``: ``evaluate_clause`` uses a compiled
case-insensitive fullmatch). Here the same semantics run as a
broadcast-join + JVM ``rlike`` — the principals x resources product is
pre-filtered by the pattern's literal prefix so it never degenerates to
a full cross product.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F

_SPECIAL = re.compile(r"([.+^$(){}\[\]|\\])")


def wildcard_to_regex(pattern: str) -> str:
    """``*`` -> ``.*``, ``?`` -> ``.``; everything else literal.
    Anchored + case-insensitive, matching the reference's
    ``re.IGNORECASE`` fullmatch semantics."""
    esc = _SPECIAL.sub(r"\\\1", pattern)
    return "(?i)^" + esc.replace("*", ".*").replace("?", ".") + "$"


def literal_prefix(pattern: str) -> str:
    """Longest wildcard-free prefix — the blocking key that keeps the
    evaluation from being a cross product."""
    for i, ch in enumerate(pattern):
        if ch in "*?":
            return pattern[:i]
    return pattern


def evaluate_policies(
    resources: DataFrame,
    policies: DataFrame,
    resource_col: str,
    pattern_col: str,
) -> DataFrame:
    """All (resource, policy) pairs where the wildcard pattern matches
    the resource value. ``policies`` must be small (broadcast side);
    matching is JVM ``rlike`` on the compiled regex plus a cheap
    prefix pre-filter."""
    compile_udf = F.udf(wildcard_to_regex)
    prefix_udf = F.udf(literal_prefix)
    pats = F.broadcast(
        policies.withColumn("__rx", compile_udf(F.col(pattern_col)))
        .withColumn("__pfx", prefix_udf(F.col(pattern_col)))
    )
    joined = resources.join(
        pats,
        F.lower(F.col(resource_col)).startswith(F.lower(F.col("__pfx")))
        & F.regexp_like(F.col(resource_col), F.col("__rx")),
    )
    return joined.drop("__rx", "__pfx")
