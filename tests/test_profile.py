"""Single-pass table profiler: hand-computed stats, NULL accounting,
typed min/max routing, non-simple-type handling, and column selection."""

from __future__ import annotations

from datetime import datetime

import pytest

from cartography_spark.operators.profile import profile_table


def test_profile_hand_computed(spark):
    rows = [
        (1, "a", 2.5, datetime(2024, 1, 1)),
        (2, "b", -1.0, datetime(2024, 1, 3)),
        (2, None, None, datetime(2024, 1, 2)),
    ]
    df = spark.createDataFrame(rows, "k long, s string, v double, ts timestamp")
    got = {r["col_name"]: r for r in profile_table(df).collect()}
    assert set(got) == {"k", "s", "v", "ts"}
    k = got["k"]
    assert (k["n_rows"], k["n_nulls"], k["n_distinct"]) == (3, 0, 2)
    assert (k["min_num"], k["max_num"]) == (1.0, 2.0)
    assert k["min_str"] is None
    s = got["s"]
    assert (s["n_nulls"], s["n_distinct"]) == (1, 2)
    assert (s["min_str"], s["max_str"]) == ("a", "b")
    assert s["min_num"] is None
    v = got["v"]
    assert (v["min_num"], v["max_num"]) == (-1.0, 2.5)
    ts = got["ts"]
    assert ts["min_num"] == datetime(2024, 1, 1).timestamp() * 1_000_000
    assert ts["max_num"] == datetime(2024, 1, 3).timestamp() * 1_000_000


def test_profile_non_simple_types_get_counts_only(spark):
    df = spark.createDataFrame(
        [([1, 2], b"x"), (None, None)], "arr array<long>, bin binary"
    )
    got = {r["col_name"]: r for r in profile_table(df).collect()}
    for c in ("arr", "bin"):
        assert got[c]["n_rows"] == 2 and got[c]["n_nulls"] == 1
        assert got[c]["n_distinct"] is None
        assert got[c]["min_num"] is None and got[c]["min_str"] is None


def test_profile_column_selection_and_validation(spark):
    df = spark.createDataFrame([(1, "x")], "a long, b string")
    assert [r["col_name"] for r in profile_table(df, ["b"]).collect()] == ["b"]
    with pytest.raises(ValueError, match="no such column"):
        profile_table(df, ["zz"])
