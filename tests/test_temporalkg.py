"""Temporal-KG fact history (operators/temporalkg.py): crawl
assignment, gaps-and-islands validity intervals, per-transition churn.

Reference analog: ``cartography/graph/querybuilder.py`` stamps
``firstseen`` on create and ``lastupdated`` per sync; here the single
rolling tag generalizes to full interval history over a crawl
calendar, and the churn counts are the sync-over-sync drift signal.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from cartography_spark.operators.temporalkg import (
    assign_crawl,
    fact_churn,
    fact_intervals,
    fact_snapshots,
)

CAL = ("2025-01-01", "2025-02-01", "2025-03-01")


def _snaps(spark, rows):
    return spark.createDataFrame(
        rows, "crawl_id int, subj string, pred string, obj string"
    )


def test_assign_crawl_boundaries(spark):
    df = spark.createDataFrame(
        [
            (dt.datetime(2024, 12, 31, 23, 59, 59),),  # pre-calendar
            (dt.datetime(2025, 1, 1, 0, 0, 0),),  # inclusive lower bound
            (dt.datetime(2025, 1, 31, 12, 0, 0),),
            (dt.datetime(2025, 2, 1, 0, 0, 0),),
            (dt.datetime(2025, 7, 4, 0, 0, 0),),  # past the last boundary
        ],
        "warc_ts timestamp",
    )
    out = [r.crawl_id for r in assign_crawl(df, CAL).orderBy("warc_ts").collect()]
    assert out == [0, 1, 1, 2, 3]


def test_fact_snapshots_dedupe_multiplicity(spark):
    df = _snaps(spark, [(1, "A", "p", "x")] * 3 + [(2, "A", "p", "x")])
    assert fact_snapshots(df, keys=("subj", "pred", "obj")).count() == 2


def test_intervals_hand_model(spark):
    # A: crawls 1,2,4 (gap at 3) / B: 2,3 / C: 1 only.
    rows = (
        [(c, "A", "p", "x") for c in (1, 2, 4)]
        + [(c, "B", "p", "y") for c in (2, 3)]
        + [(1, "C", "p", "z")]
    )
    iv = fact_intervals(_snaps(spark, rows))
    got = {
        (r.subj, r.valid_from, r.valid_to, r.is_current)
        for r in iv.collect()
    }
    assert got == {
        ("A", 1, 2, False),
        ("A", 4, 4, True),
        ("B", 2, 3, False),
        ("C", 1, 1, False),
    }


def test_intervals_partition_invariant(spark):
    rows = [
        (1 + (i * 7) % 4, f"s{i % 11}", "p", f"o{i % 5}") for i in range(200)
    ]
    a = fact_intervals(_snaps(spark, rows).repartition(2))
    b = fact_intervals(_snaps(spark, rows).repartition(13))
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_churn_hand_model(spark):
    rows = (
        [(c, "A", "p", "x") for c in (1, 2, 4)]
        + [(c, "B", "p", "y") for c in (2, 3)]
        + [(1, "C", "p", "z")]
    )
    got = {
        (r.crawl_id, r.n_added, r.n_removed, r.n_retained)
        for r in fact_churn(_snaps(spark, rows)).collect()
    }
    # 1:{A,C} 2:{A,B} 3:{B} 4:{A}
    assert got == {(2, 1, 1, 1), (3, 0, 1, 1), (4, 1, 1, 0)}


def test_churn_single_crawl_run_emits_no_retained(spark):
    # Present at 1 and 3 only (two length-1 runs): the within-run
    # 'retained' expansion must be EMPTY, not a descending
    # sequence(s+1, s) artifact.
    got = {
        (r.crawl_id, r.n_added, r.n_removed, r.n_retained)
        for r in fact_churn(_snaps(spark, [(1, "A", "p", "x"), (3, "A", "p", "x")])).collect()
    }
    assert got == {(2, 0, 1, 0), (3, 1, 0, 0)}


def test_churn_conservation_property(spark):
    """added - removed at transition c must equal n_facts(c) - n_facts(c-1)."""
    rows = [
        (1 + (i * 13) % 5, f"s{i % 17}", f"p{i % 3}", f"o{i % 7}")
        for i in range(500)
    ]
    snaps = fact_snapshots(_snaps(spark, rows))
    sizes = {
        r.crawl_id: r.n
        for r in snaps.groupBy("crawl_id").agg(F.count("*").alias("n")).collect()
    }
    for r in fact_churn(snaps).collect():
        assert r.n_added - r.n_removed == sizes[r.crawl_id] - sizes[r.crawl_id - 1]
        assert r.n_retained == sizes[r.crawl_id - 1] - r.n_removed


def test_intervals_single_shuffle_no_single_partition(spark):
    rows = [(1 + i % 3, f"s{i % 19}", "p", f"o{i % 5}") for i in range(300)]
    iv = fact_intervals(_snaps(spark, rows).repartition(8))
    iv.collect()
    final = (
        iv._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    )
    # The ONLY single-partition exchange allowed is the 1-row
    # max-crawl fold (its map-side partial_max means <= #partitions
    # rows move); the fact stream itself must never funnel through one.
    lines = final.splitlines()
    singles = [i for i, ln in enumerate(lines) if "Exchange SinglePartition" in ln]
    assert len(singles) <= 1
    for i in singles:
        assert "partial_max" in lines[i + 1], lines[i : i + 2]
    # One fact-key exchange for the groupBy; anything else feeding a
    # hash shuffle would mean the islands split leaked a second pass.
    assert final.count("Exchange hashpartitioning") <= 2


def test_pages_crawl_assignment_matches_id_parity(spark):
    """The generator plants even ids in the 2025-01 batch and odd ids
    in 2025-02; assign_crawl over warc_ts must reproduce exactly that
    (the invariant the kg_fact_intervals oracle leans on)."""
    from cartography_spark.sources.pages import synthesize_pages

    pages = synthesize_pages(spark, 200, seed=42)
    tagged = assign_crawl(pages, ("2025-01-01", "2025-02-01"))
    bad = tagged.where(
        F.col("crawl_id")
        != 1 + (F.regexp_extract("url", r"/page/(\d+)$", 1).cast("long") % 2)
    )
    assert bad.count() == 0


def test_intervals_empty_input(spark):
    empty = _snaps(spark, []).limit(0)
    assert fact_intervals(empty).count() == 0
    assert fact_churn(empty).count() == 0
