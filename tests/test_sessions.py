"""Gap-based sessionization semantics vs a pure-Python model, plus the
one-exchange plan pin."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from cartography_spark.operators.sessions import session_stats, sessionize

T0 = datetime(2024, 1, 1)


def _rows(spec):
    """spec: {key: [offset_seconds,...]} -> (key, ts, value) rows."""
    out = []
    for key, offs in spec.items():
        for i, off in enumerate(offs):
            out.append((key, T0 + timedelta(seconds=off), float(i)))
    return out


def _model(offs, gap):
    """Python model: session number per event (1-based, time order)."""
    sess, prev, n = [], None, 0
    for off in sorted(offs):
        if prev is None or off - prev > gap:
            n += 1
        sess.append((off, n))
        prev = off
    return dict(sess)


def test_sessionize_matches_python_model(spark):
    spec = {
        "a": [0, 10, 25, 100, 101, 400],
        "b": [5],
        "c": [0, 31, 62, 93],     # every gap breaks at gap=30
    }
    gap = 30.0
    df = spark.createDataFrame(_rows(spec), "key string, ts timestamp, value double")
    got = {
        (r["key"], r["ts"]): r["session_seq"]
        for r in sessionize(df, "key", "ts", gap).collect()
    }
    for key, offs in spec.items():
        model = _model(offs, gap)
        for off, sess in model.items():
            assert got[(key, T0 + timedelta(seconds=off))] == sess, (key, off)


def test_sessionize_gap_boundary_is_strictly_greater(spark):
    """A gap EXACTLY equal to the threshold does NOT break the session
    (strictly-greater rule, pinned so both engines agree forever)."""
    df = spark.createDataFrame(
        [("k", T0), ("k", T0 + timedelta(seconds=30)),
         ("k", T0 + timedelta(seconds=60, microseconds=1))],
        "key string, ts timestamp",
    )
    got = sorted(
        (r["ts"], r["session_seq"]) for r in sessionize(df, "key", "ts", 30.0).collect()
    )
    assert [s for _, s in got] == [1, 1, 2]


def test_session_stats_aggregates(spark):
    df = spark.createDataFrame(
        _rows({"a": [0, 10, 100, 130]}), "key string, ts timestamp, value double"
    )
    got = {
        r["session_seq"]: (r["n_events"], r["duration_sec"], r["sum_value"])
        for r in session_stats(df, "key", "ts", 30.0, value_col="value").collect()
    }
    assert got == {1: (2, 10.0, 1.0), 2: (2, 30.0, 5.0)}


def test_sessionize_is_single_exchange(spark):
    """Both windows (lag flag + running sum) share the (key, ts) sort:
    the whole operator is ONE hash exchange; session_stats adds only
    the aggregation exchange."""
    df = spark.createDataFrame(
        _rows({"a": [0, 10], "b": [5]}), "key string, ts timestamp, value double"
    )
    plan = sessionize(df, "key", "ts", 30.0)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    plan2 = (
        session_stats(df, "key", "ts", 30.0)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan2.count("Exchange hashpartitioning") <= 2


def test_sessionize_handles_ntz_timestamps(spark, tmp_path):
    """Parquet round-trip produces TIMESTAMP_NTZ columns — the operator
    must accept them (regression: unix_micros rejects NTZ without the
    cast)."""
    p = str(tmp_path / "ev")
    spark.createDataFrame(
        _rows({"a": [0, 10, 100]}), "key string, ts timestamp_ntz, value double"
    ).write.parquet(p)
    back = spark.read.parquet(p)
    assert dict(back.dtypes)["ts"] == "timestamp_ntz"
    got = sorted(r["session_seq"] for r in sessionize(back, "key", "ts", 30.0).collect())
    assert got == [1, 1, 2]


def test_approx_percentile_agrees_with_exact_within_bound(spark):
    """The 100-TB percentile path is approx_percentile (bounded-memory
    sketch); pin its agreement with the exact form on a generated
    distribution so the documented scale guidance stays honest."""
    rows = [(i % 4, float((i * 37) % 1000) + (i % 7) * 0.1) for i in range(4000)]
    df = spark.createDataFrame(rows, "g int, v double")
    joined = (
        df.groupBy("g").agg(
            F.percentile("v", 0.95).alias("exact"),
            F.percentile_approx("v", 0.95, 10000).alias("approx"),
        )
    ).collect()
    for r in joined:
        spread = 1000.0
        assert abs(r["exact"] - r["approx"]) <= 0.01 * spread, r


def test_rolling_window_one_exchange_and_model(spark, tmp_path):
    import json as _json

    from pyspark.sql import functions as F

    rows = [
        (1, "2025-01-01 00:00:00", 10, "a", 1.0, "{}"),
        (2, "2025-01-01 00:01:00", 10, "a", 2.0, "{}"),
        (3, "2025-01-01 00:02:00", 10, "a", 4.0, "{}"),
        (4, "2025-01-01 00:03:00", 10, "a", 8.0, "{}"),
        (5, "2025-01-01 00:00:30", 20, "b", 5.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.to_timestamp("ts"))
    d = str(tmp_path / "events.parquet")
    df.write.parquet(d)

    from cartography_spark.queries.catalog import agg_rolling_window

    out = agg_rolling_window(spark, str(tmp_path))
    got = {r["event_id"]: (r["roll_sum"], r["roll_min"], r["roll_max"], r["roll_n"])
           for r in out.collect()}
    assert got[1] == (1.0, 1.0, 1.0, 1)
    assert got[2] == (3.0, 1.0, 2.0, 2)
    assert got[3] == (7.0, 1.0, 4.0, 3)
    assert got[4] == (14.0, 2.0, 8.0, 3)   # frame slides: drops event 1
    assert got[5] == (5.0, 5.0, 5.0, 1)    # other user isolated
    # After collect() AQE prints Final + Initial sections; count the
    # final plan only (both rolling frames share ONE exchange).
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange hashpartitioning") == 1
    assert "SinglePartition" not in final


def test_session_sequences_hand_computed(spark):
    from datetime import datetime, timedelta

    from cartography_spark.operators.sessions import session_sequences

    t0 = datetime(2024, 1, 1)
    rows = [
        ("u1", t0, "view"),
        ("u1", t0 + timedelta(seconds=10), "click"),
        ("u1", t0 + timedelta(seconds=10), "buy"),    # equal ts: token order
        ("u1", t0 + timedelta(hours=9), "view"),      # new session (8h gap)
        ("u2", t0, "signup"),
    ]
    df = spark.createDataFrame(rows, "user string, ts timestamp, etype string")
    got = sorted(
        (r["key"], r["session_start"], r["n_events"], r["sequence"])
        for r in session_sequences(df, "user", "ts", "etype", 8 * 3600.0).collect()
    )
    assert got == [
        ("u1", t0, 3, "view buy click"),
        ("u1", t0 + timedelta(hours=9), 1, "view"),
        ("u2", t0, 1, "signup"),
    ]
