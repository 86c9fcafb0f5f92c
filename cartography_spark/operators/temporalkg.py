"""Temporal knowledge-graph fact history: crawl-snapshot assignment,
fact validity intervals, and per-transition churn.

This is the web-scale generalization of the reference's
``firstseen`` / ``lastupdated`` lifecycle semantics
(``/root/reference/cartography/graph/querybuilder.py`` stamps
``firstseen`` on create and ``lastupdated`` every sync;
``cleanup`` sweeps rows whose ``lastupdated`` lags the run): with a
crawl *calendar* of N snapshots instead of a single rolling sync tag,
each (subj, pred, obj) fact carries full interval history — when it
appeared, when it vanished, whether it re-appeared — and the
"stale sweep" becomes the ``is_current = false`` predicate.

Scale design (the shapes that survive 10^12 pages x ~100 crawls):

- ``assign_crawl`` is a row-local sum of boundary indicators — no
  join, no shuffle, stays inside whole-stage codegen. The crawl
  calendar is a few dozen literals (Common Crawl ships ~8/yr).
- ``fact_intervals`` uses ONE hash shuffle on the fact key: per-fact
  crawl sets are collected into a sorted array (bounded by the crawl
  count, never by corpus size) and the gaps-and-islands split runs
  row-locally with array higher-order functions. The classic
  window-function spelling (row_number - crawl) needs the same
  shuffle for the window PLUS a second one for the interval
  aggregation; the array form does both in one.
- ``fact_churn`` emits O(1) transition events per interval directly
  from the islands arrays (never #facts x #crawls rows), then one
  tiny aggregation keyed by crawl.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F

FACT_KEYS = ("subj", "pred", "obj")


def assign_crawl(
    df: DataFrame,
    boundaries: Sequence[str],
    ts_col: str = "warc_ts",
    out_col: str = "crawl_id",
) -> DataFrame:
    """Tag each row with its 1-based crawl-snapshot index.

    ``boundaries`` is the sorted crawl calendar (ISO timestamps);
    crawl ``i`` covers ``[boundaries[i-1], boundaries[i])``. Rows
    before the first boundary get 0 (pre-calendar; callers filter).
    Pure row-local arithmetic — the sum of ``ts >= b`` indicators is
    the index of the greatest boundary at-or-before the row.
    """
    ts = F.col(ts_col)
    idx: Column = F.lit(0)
    for b in boundaries:
        idx = idx + (ts >= F.lit(b).cast("timestamp")).cast("int")
    return df.withColumn(out_col, idx)


def fact_snapshots(
    triples: DataFrame,
    crawl_col: str = "crawl_id",
    keys: Sequence[str] = FACT_KEYS,
) -> DataFrame:
    """Distinct (crawl, fact) assertions — a fact asserted by any page
    of a crawl is present in that crawl, multiplicity discarded. One
    partial-aggregated dedup shuffle on the full key."""
    return triples.select(crawl_col, *keys).distinct()


def _islands(
    snapshots: DataFrame, crawl_col: str, keys: Sequence[str]
) -> DataFrame:
    """Per-fact interval arrays: ``starts[i]..ends[i]`` are the maximal
    consecutive-crawl runs. ONE shuffle (the fact-key groupBy); the
    split is row-local over the per-fact sorted crawl array, whose
    length is bounded by the crawl-calendar size.

    Requires dense integer crawl ids (consecutive snapshot indexes, as
    :func:`assign_crawl` produces) — a gap in the id space reads as the
    fact vanishing for those crawls, which is exactly the semantics.
    """
    arr = F.sort_array(F.collect_set(crawl_col)).alias("__crawls")
    grouped = snapshots.groupBy(*keys).agg(arr)
    a = F.col("__crawls")
    # F.get is 0-based and NULL-safe out of bounds (element_at would
    # throw on index 0 for the first element's predecessor probe).
    starts = F.filter(
        a, lambda x, i: F.get(a, i - 1).isNull() | (F.get(a, i - 1) != x - 1)
    )
    ends = F.filter(
        a, lambda x, i: F.get(a, i + 1).isNull() | (F.get(a, i + 1) != x + 1)
    )
    return grouped.select(
        *keys, starts.alias("__starts"), ends.alias("__ends")
    )


def fact_intervals(
    snapshots: DataFrame,
    crawl_col: str = "crawl_id",
    keys: Sequence[str] = FACT_KEYS,
) -> DataFrame:
    """SCD-style validity intervals per fact: one row per maximal run
    of consecutive crawls asserting it, with ``valid_from`` /
    ``valid_to`` crawl ids and ``is_current`` (run reaches the latest
    crawl). A fact that vanished and re-appeared has several rows —
    the history the reference's single ``lastupdated`` tag collapses.
    """
    isl = _islands(snapshots, crawl_col, keys)
    iv = isl.select(
        *keys,
        F.explode(F.arrays_zip(F.col("__starts"), F.col("__ends"))).alias("__iv"),
    ).select(
        *keys,
        F.col("__iv.__starts").alias("valid_from"),
        F.col("__iv.__ends").alias("valid_to"),
    )
    # Latest crawl: 1-row aggregate broadcast onto every interval
    # (never collected to the driver).
    mx = snapshots.agg(F.max(crawl_col).alias("__max_crawl"))
    return iv.crossJoin(F.broadcast(mx)).select(
        *keys,
        "valid_from",
        "valid_to",
        (F.col("valid_to") == F.col("__max_crawl")).alias("is_current"),
    )


def fact_churn(
    snapshots: DataFrame,
    crawl_col: str = "crawl_id",
    keys: Sequence[str] = FACT_KEYS,
) -> DataFrame:
    """Per crawl transition (crawl c vs c-1, for c >= 2): how many
    facts were added (present at c, absent at c-1), removed (the
    reverse), and retained (present at both). The sync-over-sync drift
    signal a crawl operator watches.

    Event emission is O(intervals), not O(facts x crawls): an interval
    [s, e] contributes one 'added' at s (if s > 1), one 'removed' at
    e+1 (if e < latest), and 'retained' for each crawl in (s, e].
    Transitions with zero events still appear (zero-filled from the
    crawl calendar derived off the same 1-row max aggregate).
    """
    isl = _islands(snapshots, crawl_col, keys)
    mx = snapshots.agg(F.max(crawl_col).alias("__max_crawl"))
    ev = isl.crossJoin(F.broadcast(mx)).select(
        F.explode(
            F.concat(
                # added at each run start past the first crawl
                F.transform(
                    F.filter(F.col("__starts"), lambda s: s > 1),
                    lambda s: F.struct(
                        s.alias("crawl_id"), F.lit("added").alias("kind")
                    ),
                ),
                # removed at run end + 1 when the run stops early
                F.transform(
                    F.filter(F.col("__ends"), lambda e: e < F.col("__max_crawl")),
                    lambda e: F.struct(
                        (e + 1).alias("crawl_id"), F.lit("removed").alias("kind")
                    ),
                ),
                # retained across every within-run transition
                F.flatten(
                    F.zip_with(
                        F.col("__starts"),
                        F.col("__ends"),
                        # sequence(start, stop) DESCENDS when start >
                        # stop, so a length-1 run ([s, s]) must map to
                        # an empty array explicitly.
                        lambda s, e: F.when(
                            e > s,
                            F.transform(
                                F.sequence(s + 1, e),
                                lambda c: F.struct(
                                    c.alias("crawl_id"),
                                    F.lit("retained").alias("kind"),
                                ),
                            ),
                        ).otherwise(
                            F.array().cast(
                                "array<struct<crawl_id:int,kind:string>>"
                            )
                        ),
                    )
                ),
            )
        ).alias("__ev")
    ).select("__ev.crawl_id", "__ev.kind")
    counts = ev.groupBy("crawl_id").agg(
        F.sum((F.col("kind") == "added").cast("long")).alias("n_added"),
        F.sum((F.col("kind") == "removed").cast("long")).alias("n_removed"),
        F.sum((F.col("kind") == "retained").cast("long")).alias("n_retained"),
    )
    calendar = mx.select(
        F.explode(F.sequence(F.lit(2), F.col("__max_crawl"))).alias("crawl_id")
    )
    return (
        calendar.join(counts, "crawl_id", "left")
        .select(
            "crawl_id",
            F.coalesce("n_added", F.lit(0)).alias("n_added"),
            F.coalesce("n_removed", F.lit(0)).alias("n_removed"),
            F.coalesce("n_retained", F.lit(0)).alias("n_retained"),
        )
    )
