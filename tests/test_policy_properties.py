"""Property-based check of the distributed policy evaluator against an
independent pure-Python model of the reference's documented semantics
(permission_relationships.py:21-177): per-clause IGNORECASE fullmatch
with '.' escaped / '*'->'.*' / '?'->'.?', notaction skip, missing-action
applies, resource required, notresource veto, deny-before-allow at the
first determined permission, any-policy deny override.

The model is written from the spec, not ported — a second
implementation, like the DuckDB oracles."""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cartography_spark.functions.policy import (
    STATEMENTS_DDL,
    permission_relationships,
    policy_verdicts,
)

# -------- pure-Python model --------


def _rx(clause: str) -> re.Pattern:
    pat = clause.replace(".", "\\.").replace("*", ".*").replace("?", ".?")
    return re.compile("^" + pat + "$", re.IGNORECASE)


def _any(clauses, target) -> bool:
    return any(_rx(c).fullmatch(target) for c in (clauses or []))


def _stmt_matches(s: dict, perm: str, arn: str) -> bool:
    if s.get("notaction") is not None and _any(s["notaction"], perm):
        return False
    if s.get("action") is not None and not _any(s["action"], perm):
        return False
    if s.get("resource") is None or not _any(s["resource"], arn):
        return False
    if s.get("notresource") is not None and _any(s["notresource"], arn):
        return False
    return True


def model_policy(statements: list[dict], permissions: list[str], arn: str):
    """(allowed, denied) for ONE policy — None-determination = (False, False)."""
    allows = [s for s in statements if s["effect"] == "Allow"]
    denies = [s for s in statements if s["effect"] == "Deny"]
    for perm in permissions:
        if any(_stmt_matches(s, perm, arn) for s in denies):
            return (False, True)
        if any(_stmt_matches(s, perm, arn) for s in allows):
            return (True, False)
    return (False, False)


def model_granted(policies: dict[str, list[dict]], permissions, arn) -> bool:
    granted = False
    for stmts in policies.values():
        allowed, denied = model_policy(stmts, permissions, arn)
        if denied:
            return False
        granted = granted or allowed
    return granted


# -------- generators (restricted alphabet keeps every clause a valid regex) --------

_word = st.text(alphabet="abs3:*?", min_size=1, max_size=4)
_clauses = st.one_of(st.none(), st.lists(_word, min_size=1, max_size=2))

_statement = st.fixed_dictionaries(
    {
        "effect": st.sampled_from(["Allow", "Deny"]),
        "action": _clauses,
        "notaction": _clauses,
        "resource": _clauses,
        "notresource": _clauses,
    }
)
_policies = st.dictionaries(
    st.sampled_from(["p1", "p2"]), st.lists(_statement, min_size=1, max_size=3),
    min_size=1, max_size=2,
)
_perms = st.lists(st.sampled_from(["s3:Get", "s3:Put", "ab"]), min_size=1, max_size=2, unique=True)
_arns = st.lists(st.sampled_from(["s3:ab", "ab", "ss3:x"]), min_size=1, max_size=2, unique=True)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(policies=_policies, perms=_perms, arns=_arns)
def test_policy_evaluator_matches_reference_model(spark, policies, perms, arns):
    rows = []
    for pid, stmts in policies.items():
        for i, s in enumerate(stmts):
            rows.append(
                ("pr", pid, i, s["effect"], s["action"], s["notaction"],
                 s["resource"], s["notresource"])
            )
    stmts_df = spark.createDataFrame(rows, STATEMENTS_DDL)
    res = spark.createDataFrame([(a,) for a in arns], "resource_arn string")

    got_verdicts = {
        (r["policy_id"], r["resource_arn"]): r["denied"]
        for r in policy_verdicts(stmts_df, res, perms).collect()
    }
    for pid, stmts in policies.items():
        for arn in arns:
            allowed, denied = model_policy(stmts, perms, arn)
            key = (pid, arn)
            if not allowed and not denied:
                assert key not in got_verdicts
            else:
                assert got_verdicts.get(key) == denied

    got_granted = {
        r["resource_arn"]
        for r in permission_relationships(stmts_df, res, perms).collect()
    }
    expect = {a for a in arns if model_granted(policies, perms, a)}
    assert got_granted == expect
