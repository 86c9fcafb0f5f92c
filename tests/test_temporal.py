"""As-of join semantics on small fixtures with a pure-Python model
(the same brute-force-oracle test style as test_dedup.py). Temporal
joins are NOT PRESENT in the reference (SURVEY §2) — the contract here
is pandas-merge_asof / DuckDB-ASOF-JOIN semantics."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from cartography_spark.operators.temporal import asof_join


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    versions = spark.createDataFrame(
        [
            ("k1", _ts("2024-01-01T00:00:10"), "v1"),
            ("k1", _ts("2024-01-01T00:00:20"), "v2"),
            ("k1", _ts("2024-01-01T00:00:30"), "v3"),
            ("k2", _ts("2024-01-01T00:00:15"), "w1"),
        ],
        "key string, vts timestamp, val string",
    )
    queries = spark.createDataFrame(
        [
            (1, "k1", _ts("2024-01-01T00:00:05")),   # before any version
            (2, "k1", _ts("2024-01-01T00:00:20")),   # exactly at v2
            (3, "k1", _ts("2024-01-01T00:00:25")),   # between v2 and v3
            (4, "k1", _ts("2024-01-01T00:01:40")),   # long after v3
            (5, "k2", _ts("2024-01-01T00:00:14")),   # before w1
            (6, "k3", _ts("2024-01-01T00:00:50")),   # key with no versions
        ],
        "qid long, key string, qts timestamp",
    )
    return versions, queries


def test_asof_backward_model(frames):
    versions, queries = frames
    out = asof_join(
        versions, queries, on="key", version_ts="vts", query_ts="qts",
        payload=["val"],
    )
    got = {r["qid"]: r["val"] for r in out.collect()}
    # at-or-before, equality included, left semantics for no-match
    assert got == {1: None, 2: "v2", 3: "v2", 4: "v3", 5: None, 6: None}
    assert out.count() == queries.count()


def test_asof_forward_model(frames):
    versions, queries = frames
    out = asof_join(
        versions, queries, on="key", version_ts="vts", query_ts="qts",
        payload=["val"], direction="forward",
    )
    got = {r["qid"]: r["val"] for r in out.collect()}
    # at-or-after, equality included
    assert got == {1: "v1", 2: "v2", 3: "v3", 4: None, 5: "w1", 6: None}


def test_asof_tolerance_nulls_stale_matches(frames):
    versions, queries = frames
    out = asof_join(
        versions, queries, on="key", version_ts="vts", query_ts="qts",
        payload=["val"], tolerance_seconds=10.0,
    )
    got = {r["qid"]: r["val"] for r in out.collect()}
    # qid=4 is 70s after v3 -> out of tolerance; qid=3 is 5s after v2 -> in
    assert got == {1: None, 2: "v2", 3: "v2", 4: None, 5: None, 6: None}
    # matched_ts nulled together with the payload
    mt = {r["qid"]: r["matched_ts"] for r in out.collect()}
    assert mt[4] is None and mt[2] is not None


def test_asof_plan_is_single_exchange_no_cartesian(frames):
    """The whole as-of is ONE hash exchange of the tagged union plus an
    in-partition sort — the sort-merge-join lower bound. No cross
    product, no range-join explosion."""
    versions, queries = frames
    out = asof_join(
        versions, queries, on="key", version_ts="vts", query_ts="qts",
        payload=["val"],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_asof_payload_collision_raises(frames):
    versions, queries = frames
    with pytest.raises(ValueError, match="collide"):
        asof_join(
            versions, queries.withColumnRenamed("qid", "val"),
            on="key", version_ts="vts", query_ts="qts", payload=["val"],
        )


def test_asof_matches_duckdb_native(spark):
    """Cross-engine: the Spark window formulation equals DuckDB's
    native ASOF JOIN on a generated fixture (independent algorithm,
    engine-native semantics)."""
    import duckdb

    versions = [
        (f"k{i % 7}", _ts(f"2024-01-01T00:{i % 60:02d}:{(i * 13) % 60:02d}"), float(i))
        for i in range(120)
    ]
    queries = [
        (i, f"k{i % 9}", _ts(f"2024-01-01T00:{(i * 7) % 60:02d}:{(i * 29) % 60:02d}"))
        for i in range(80)
    ]
    vdf = spark.createDataFrame(versions, "key string, vts timestamp, val double")
    qdf = spark.createDataFrame(queries, "qid long, key string, qts timestamp")
    out = asof_join(vdf, qdf, on="key", version_ts="vts", query_ts="qts", payload=["val"])
    got = sorted(
        (r["qid"], r["key"], r["val"]) for r in out.collect()
    )

    con = duckdb.connect()
    con.execute("CREATE TABLE v(key VARCHAR, vts TIMESTAMP, val DOUBLE)")
    con.executemany("INSERT INTO v VALUES (?, ?, ?)", versions)
    con.execute("CREATE TABLE q(qid BIGINT, key VARCHAR, qts TIMESTAMP)")
    con.executemany("INSERT INTO q VALUES (?, ?, ?)", queries)
    exp = sorted(
        tuple(r) for r in con.execute(
            "SELECT q.qid, q.key, v.val FROM q ASOF LEFT JOIN v "
            "ON q.key = v.key AND q.qts >= v.vts"
        ).fetchall()
    )
    assert got == exp


def test_asof_tolerance_handles_ntz_timestamps(spark, tmp_path):
    """Parquet round-trip yields TIMESTAMP_NTZ; the tolerance gap math
    must accept it (regression: unix_micros rejects NTZ without the
    cast)."""
    vp, qp = str(tmp_path / "v"), str(tmp_path / "q")
    spark.createDataFrame(
        [("k", _ts("2024-01-01T00:00:10"), "v1")],
        "key string, vts timestamp_ntz, val string",
    ).write.parquet(vp)
    spark.createDataFrame(
        [(1, "k", _ts("2024-01-01T00:00:15")), (2, "k", _ts("2024-01-01T00:05:00"))],
        "qid long, key string, qts timestamp_ntz",
    ).write.parquet(qp)
    out = asof_join(
        spark.read.parquet(vp), spark.read.parquet(qp),
        on="key", version_ts="vts", query_ts="qts", payload=["val"],
        tolerance_seconds=60.0,
    )
    got = {r["qid"]: r["val"] for r in out.collect()}
    assert got == {1: "v1", 2: None}


def test_asof_null_timestamps_are_deterministic(spark):
    """NULL-ts versions are dropped (unorderable); NULL-ts queries keep
    their row with NULL payload in BOTH directions."""
    versions = spark.createDataFrame(
        [("k", _ts("2024-01-01T00:00:10"), "v1"), ("k", None, "vN")],
        "key string, vts timestamp, val string",
    )
    queries = spark.createDataFrame(
        [(1, "k", _ts("2024-01-01T00:00:15")), (2, "k", None)],
        "qid long, key string, qts timestamp",
    )
    for direction, want1 in (("backward", "v1"), ("forward", None)):
        got = {
            r["qid"]: r["val"]
            for r in asof_join(
                versions, queries, on="key", version_ts="vts", query_ts="qts",
                payload=["val"], direction=direction,
            ).collect()
        }
        assert got[2] is None, direction        # null-ts query -> null payload
        assert got[1] == want1, direction       # vN never matches anything


def test_asof_matched_ts_collision_raises(spark, frames):
    versions, queries = frames
    with pytest.raises(ValueError, match="collide"):
        asof_join(
            versions, queries.withColumnRenamed("qid", "matched_ts"),
            on="key", version_ts="vts", query_ts="qts", payload=["val"],
        )


def test_interval_join_model_and_plan(spark):
    """Boundary inclusivity at both ends, multi-bucket intervals,
    overlap fan-out (N containing intervals -> N rows), inner drop for
    uncontained points — vs a brute-force Python model — and the plan
    must be an equi-join (no BNLJ/cartesian, which is what the naive
    BETWEEN theta-join plans)."""
    from cartography_spark.operators.temporal import interval_join

    iv = [
        ("k", _ts("2024-01-01T00:00:10"), _ts("2024-01-03T00:00:20"), "i1"),  # 3 buckets at 1d
        ("k", _ts("2024-01-01T00:00:15"), _ts("2024-01-01T00:00:30"), "i2"),  # overlaps i1
        ("x", _ts("2024-01-01T00:00:00"), _ts("2024-01-01T00:01:00"), "i3"),
    ]
    pts = [
        (1, "k", _ts("2024-01-01T00:00:10")),  # == i1.start (inclusive)
        (2, "k", _ts("2024-01-01T00:00:20")),  # inside i1 AND i2
        (3, "k", _ts("2024-01-03T00:00:20")),  # == i1.end (inclusive), 2 buckets away
        (4, "k", _ts("2024-01-05T00:00:00")),  # in nothing
        (5, "x", _ts("2024-01-01T00:00:30")),  # other key
        (6, "k", _ts("2024-01-01T00:00:30")),  # i1 + i2 end boundary
    ]
    ivdf = spark.createDataFrame(iv, "key string, lo timestamp, hi timestamp, name string")
    ptdf = spark.createDataFrame(pts, "pid long, key string, pt timestamp")
    out = interval_join(
        ptdf, ivdf, on="key", point_ts="pt", start_ts="lo", end_ts="hi",
        payload=["name"], bucket_seconds=86400.0,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan

    got = sorted((r["pid"], r["name"]) for r in out.collect())
    model = sorted(
        (pid, name)
        for pid, pkey, pt in pts
        for key, lo, hi, name in iv
        if pkey == key and lo <= pt <= hi
    )
    assert got == model
    assert (4, "i1") not in got and got.count((2, "i1")) == 1


def test_interval_join_payload_collision_raises(spark):
    from cartography_spark.operators.temporal import interval_join

    ivdf = spark.createDataFrame(
        [("k", _ts("2024-01-01T00:00:00"), _ts("2024-01-02T00:00:00"), "n")],
        "key string, lo timestamp, hi timestamp, pid string",
    )
    ptdf = spark.createDataFrame(
        [(1, "k", _ts("2024-01-01T12:00:00"))], "pid long, key string, pt timestamp"
    )
    with pytest.raises(ValueError, match="collide"):
        interval_join(ptdf, ivdf, on="key", point_ts="pt", start_ts="lo",
                      end_ts="hi", payload=["pid"])


def test_asof_null_keys_never_match(spark):
    """NULL join keys must not match each other (DuckDB/pandas
    contract: NULL != NULL in a join) — regression for the window
    partitioning grouping NULL keys together."""
    versions = spark.createDataFrame(
        [(None, _ts("2024-01-01T00:00:10"), "v1")],
        "key string, vts timestamp, val string",
    )
    queries = spark.createDataFrame(
        [(1, None, _ts("2024-01-01T00:00:15")),
         (2, "k", _ts("2024-01-01T00:00:15"))],
        "qid long, key string, qts timestamp",
    )
    got = {
        r["qid"]: r["val"]
        for r in asof_join(
            versions, queries, on="key", version_ts="vts", query_ts="qts",
            payload=["val"],
        ).collect()
    }
    assert got == {1: None, 2: None}   # phantom match would give 1: 'v1'


def test_gap_and_tolerance_microsecond_rounding(spark):
    """Decimal gaps like 0.7s are 699999.999...µs in float; int()
    truncation would break the inclusive boundary by 1µs. Pin round():
    a gap of exactly 0.7s does NOT break a 0.7s session, and an as-of
    match exactly at a 0.7s tolerance is kept."""
    from datetime import timedelta

    from cartography_spark.operators.sessions import sessionize

    t0 = _ts("2024-01-01T00:00:00")
    df = spark.createDataFrame(
        [("k", t0), ("k", t0 + timedelta(microseconds=700000))],
        "key string, ts timestamp",
    )
    seqs = sorted(r["session_seq"] for r in sessionize(df, "key", "ts", 0.7).collect())
    assert seqs == [1, 1]

    versions = spark.createDataFrame([("k", t0, "v1")], "key string, vts timestamp, val string")
    queries = spark.createDataFrame(
        [(1, "k", t0 + timedelta(microseconds=700000))], "qid long, key string, qts timestamp"
    )
    out = asof_join(versions, queries, on="key", version_ts="vts", query_ts="qts",
                    payload=["val"], tolerance_seconds=0.7).collect()
    assert out[0]["val"] == "v1"
