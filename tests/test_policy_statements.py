"""Full policy statement-list resolution (T5/J6 completion): unit tests
mirroring the reference's clause matrix
(``tests/unit/cartography/intel/aws/test_permission_relationships.py``)
case for case, against the distributed evaluator.

The reference returns (allowed, explicitly_denied) per policy; here the
policy verdict surface is :func:`policy_verdicts` rows:
(True, False) <-> row with denied=False; (False, True) <-> denied=True;
(False, False) <-> no row (policy determines nothing).
"""

from __future__ import annotations

import pytest

from cartography_spark.functions.policy import (
    STATEMENTS_DDL,
    permission_relationships,
    policy_verdicts,
)

ARN = "arn:aws:s3:::testbucket"


def _stmts(spark, dicts, principal="p", policy="pol"):
    rows = [
        (
            principal,
            d.get("policy", policy),
            i,
            d["effect"],
            d.get("action"),
            d.get("notaction"),
            d.get("resource"),
            d.get("notresource"),
        )
        for i, d in enumerate(dicts)
    ]
    return spark.createDataFrame(rows, STATEMENTS_DDL)


def _verdict(spark, dicts, permissions, arn=ARN):
    """None = (False, False); False = (True, False) allow;
    True = (False, True) explicit deny — per single policy."""
    res = spark.createDataFrame([(arn,)], "resource_arn string")
    rows = policy_verdicts(_stmts(spark, dicts), res, permissions).collect()
    if not rows:
        return None
    assert len(rows) == 1
    return rows[0]["denied"]


def test_admin_statements(spark):
    s = [{"action": ["*"], "resource": ["*"], "effect": "Allow"}]
    assert _verdict(spark, s, ["S3:GetObject"]) is False


def test_not_action_statement(spark):
    s = [{"action": ["*"], "notaction": ["S3:GetObject"], "resource": ["*"], "effect": "Allow"}]
    assert _verdict(spark, s, ["S3:GetObject"]) is None


def test_deny_overrides_allow_within_policy(spark):
    s = [
        {"action": ["*"], "resource": ["*"], "effect": "Allow"},
        {"action": ["S3:GetObject"], "resource": ["*"], "effect": "Deny"},
    ]
    assert _verdict(spark, s, ["S3:GetObject"]) is True


def test_single_permission(spark):
    s = [{"action": ["S3:GetObject"], "resource": ["*"], "effect": "Allow"}]
    assert _verdict(spark, s, ["S3:GetObject"]) is False


def test_single_non_matching_permission(spark):
    s = [{"action": ["S3:GetObject"], "resource": ["*"], "effect": "Allow"}]
    assert _verdict(spark, s, ["S3:PutObject"]) is None


def test_multiple_permission_first_determined_wins(spark):
    # perm[0] matches nothing; perm[1] is allowed -> allow
    s = [{"action": ["s3:Get*"], "resource": ["*"], "effect": "Allow"}]
    assert _verdict(spark, s, ["dynamodb:Query", "S3:GetObject"]) is False
    # perm[0] denied; perm[1] would be allowed -> the deny at index 0
    # determines the policy (reference loops permissions in order)
    s2 = [
        {"action": ["dynamodb:*"], "resource": ["*"], "effect": "Deny"},
        {"action": ["s3:Get*"], "resource": ["*"], "effect": "Allow"},
    ]
    assert _verdict(spark, s2, ["dynamodb:Query", "S3:GetObject"]) is True


def test_single_permission_lower_case(spark):
    s = [{"action": ["s3:getobject"], "resource": ["*"], "effect": "Allow"}]
    assert _verdict(spark, s, ["S3:GetObject"]) is False


def test_single_permission_resource_allow(spark):
    s = [{"action": ["s3:Get*"], "resource": ["arn:aws:s3:::test*"], "effect": "Allow"}]
    assert _verdict(spark, s, ["S3:GetObject"]) is False


def test_single_permission_resource_non_match(spark):
    s = [{"action": ["s3:Get*"], "resource": ["arn:aws:s3:::nottest"], "effect": "Allow"}]
    assert _verdict(spark, s, ["S3:GetObject"]) is None


def test_non_matching_notresource(spark):
    s = [
        {
            "action": ["s3:Get*"],
            "resource": ["*"],
            "notresource": ["arn:aws:s3:::nottest"],
            "effect": "Allow",
        }
    ]
    assert _verdict(spark, s, ["S3:GetObject"]) is False


def test_matching_notresource_blocks(spark):
    s = [
        {
            "action": ["s3:Get*"],
            "resource": ["*"],
            "notresource": ["arn:aws:s3:::test*"],
            "effect": "Allow",
        }
    ]
    assert _verdict(spark, s, ["S3:GetObject"]) is None


def test_no_action_statement_applies(spark):
    s = [{"notaction": ["dynamodb:Query"], "resource": ["*"], "effect": "Allow"}]
    assert _verdict(spark, s, ["S3:GetObject"]) is False


def test_notaction_deny_without_allow(spark):
    s = [{"notaction": ["s3:*"], "resource": ["*"], "effect": "Allow"}]
    assert _verdict(spark, s, ["S3:GetObject"]) is None


def test_notaction_malformed_pattern(spark):
    # "s3.*" compiles to s3\..* (only '.' escaped) -> misses S3:GetObject
    s = [{"notaction": ["s3.*"], "resource": ["*"], "effect": "Allow"}]
    assert _verdict(spark, s, ["S3:GetObject"]) is False


def test_resource_substring_no_match(spark):
    # fullmatch: a resource clause that is a PREFIX of the arn must miss
    s = [{"action": ["s3:*"], "resource": ["arn:aws:s3:::test"], "effect": "Allow"}]
    assert _verdict(spark, s, ["S3:GetObject"]) is None


def test_question_mark_is_zero_or_one(spark):
    # reference compiles ? -> .? (zero-or-one), not exactly-one
    s = [{"action": ["s3:GetObjec?"], "resource": ["*"], "effect": "Allow"}]
    assert _verdict(spark, s, ["S3:GetObject"]) is False
    assert _verdict(spark, s, ["S3:GetObjec"]) is False


def test_full_policy_explicit_deny_overrides_other_policy(spark):
    import pyspark.sql.functions as F

    dicts = [
        {"policy": "fakeallow", "action": ["s3:*"], "resource": ["*"], "effect": "Allow"},
        {"policy": "fakedeny", "action": ["s3:*"], "resource": ["*"], "effect": "Deny"},
    ]
    res = spark.createDataFrame([(ARN,)], "resource_arn string")
    out = permission_relationships(_stmts(spark, dicts), res, ["S3:GetObject"]).collect()
    assert out == []  # any-policy deny -> not granted


def test_full_policy_allow_multiple_principals(spark):
    dicts_a = [{"action": ["s3:*"], "resource": ["*"], "effect": "Allow"}]
    dicts_b = [{"action": ["ec2:*"], "resource": ["*"], "effect": "Allow"}]
    stmts = _stmts(spark, dicts_a, principal="alice").unionByName(
        _stmts(spark, dicts_b, principal="bob")
    )
    res = spark.createDataFrame([(ARN,)], "resource_arn string")
    out = permission_relationships(stmts, res, ["S3:GetObject"]).collect()
    assert [(r["principal_id"], r["resource_arn"]) for r in out] == [("alice", ARN)]


def test_malformed_effect_is_ignored(spark):
    """Statements whose effect is not exactly Allow/Deny land in neither
    of the reference's allow/deny lists (``evaluate_policy_for_permissions``,
    ``permission_relationships.py:125-126``) — lowercase 'allow' must not
    grant access."""
    s = [{"action": ["*"], "resource": ["*"], "effect": "allow"}]
    assert _verdict(spark, s, ["s3:GetObject"]) is None
    mixed = [
        {"action": ["*"], "resource": ["*"], "effect": "allow"},
        {"action": ["s3:*"], "resource": ["*"], "effect": "Allow"},
    ]
    assert _verdict(spark, mixed, ["s3:GetObject"]) is False


def test_invalid_clause_degrades_to_match_nothing(spark):
    """The reference's ``compile_regex`` catches ``re.error`` on a bad
    clause (e.g. '(') and degrades to ``re.compile("")`` — fullmatch of a
    non-empty target then fails (``permission_relationships.py:225-251``).
    Here the bad clause must neither throw nor match."""
    s = [{"action": ["("], "resource": ["*"], "effect": "Allow"}]
    assert _verdict(spark, s, ["s3:GetObject"]) is None
    # a bad clause must not suppress a sibling good clause
    s2 = [{"action": ["(", "s3:*"], "resource": ["*"], "effect": "Allow"}]
    assert _verdict(spark, s2, ["s3:GetObject"]) is False


def test_brace_clauses_match_python_semantics(spark):
    """Python/Java regex dialect gap: the reference compiles clauses with
    Python ``re`` where a non-quantifier ``{`` is a literal and ``{,n}``
    is a 0..n quantifier; Java's Pattern rejects both. The JVM-side
    evaluation must reproduce the Python (= reference) semantics instead
    of throwing PatternSyntaxException."""
    # literal brace: matches itself only
    s = [{"action": ["s3:get{object}"], "resource": ["*"], "effect": "Allow"}]
    assert _verdict(spark, s, ["s3:get{object}"]) is False
    assert _verdict(spark, s, ["s3:getobject"]) is None
    # valid quantifier preserved
    s = [{"action": ["ec2:a{2}b"], "resource": ["*"], "effect": "Allow"}]
    assert _verdict(spark, s, ["ec2:aab"]) is False
    assert _verdict(spark, s, ["ec2:ab"]) is None
    # Python-only {,n} = 0..n quantifier, rewritten for the JVM
    s = [{"action": ["ec2:a{,2}b"], "resource": ["*"], "effect": "Allow"}]
    assert _verdict(spark, s, ["ec2:b"]) is False
    assert _verdict(spark, s, ["ec2:ab"]) is False
    assert _verdict(spark, s, ["ec2:aab"]) is False
    assert _verdict(spark, s, ["ec2:aaab"]) is None
    # Python-only {,} = 0..inf quantifier
    s = [{"action": ["ec2:a{,}b"], "resource": ["*"], "effect": "Allow"}]
    assert _verdict(spark, s, ["ec2:aaaab"]) is False
    assert _verdict(spark, s, ["ec2:b"]) is False
    # a brace the clause ALREADY escapes is valid in both dialects and
    # must pass through untouched (double-escaping would crash Java)
    s = [{"action": ["s3:a\\{b"], "resource": ["*"], "effect": "Allow"}]
    assert _verdict(spark, s, ["s3:a{b"]) is False
    assert _verdict(spark, s, ["s3:ab"]) is None
