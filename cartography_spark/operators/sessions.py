"""Gap-based sessionization for event streams / crawl logs.

The standard web-analytics primitive Spark has no single operator for
(Structured Streaming's ``session_window`` covers the streaming
aggregate; this is the batch row-level form that assigns every event
its session): a new session starts when the gap to the user's previous
event exceeds ``gap_seconds``.

Plan shape: ONE hash exchange on the key, then two stacked window
expressions over the SAME (key, ts) sort — ``lag`` to flag boundaries,
running ``sum`` to number sessions — Catalyst plans a single Window
node pair with one sort and no extra exchange. Entirely JVM
expressions: at 100 TB this is the one-shuffle lower bound for any
per-key ordered computation, and the per-key history sorts within its
partition (the usual window skew profile — a bot key with millions of
events needs pre-filtering, same caveat as any ordered-per-key op).

Reference analog: none (batch asset graph); this belongs to the
training-data/web-pipeline operator family the round brief makes
first-class.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


from cartography_spark.operators.temporal import ts_micros as _us


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: float,
    session_col: str = "session_seq",
) -> DataFrame:
    """Append ``session_col``: a per-key session number (1-based, in
    time order) where a session break is a gap STRICTLY GREATER than
    ``gap_seconds`` since the key's previous event. Deterministic for
    distinct (key, ts) pairs; events at the identical timestamp order
    by the window's stable sort and never break a session (gap 0).
    Precondition: event timestamps are non-null (a NULL ts cannot be
    ordered; such rows sort first and fold into the key's first
    session — filter them upstream if that is not intended).
    """
    # round, not int(): decimal gaps like 0.7s are 699999.999...µs in
    # float and truncation would break the pinned gap-equal-is-same-
    # session boundary by 1µs
    gap_us = round(gap_seconds * 1_000_000)
    w = Window.partitionBy(key_col).orderBy(ts_col)
    prev = F.lag(_us(ts_col)).over(w)
    is_new = F.when(
        prev.isNull() | ((_us(ts_col) - prev) > gap_us),
        F.lit(1),
    ).otherwise(F.lit(0))
    running = Window.partitionBy(key_col).orderBy(ts_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(session_col, F.sum(is_new).over(running).cast("long"))


def session_stats(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: float,
    value_col: str | None = None,
) -> DataFrame:
    """Per-session aggregates over :func:`sessionize`: event count,
    session start/end, duration in seconds, and (optionally) the summed
    ``value_col``. The groupBy keys share the sessionize exchange's
    prefix; the aggregation is map-side-partial as usual."""
    s = sessionize(df, key_col, ts_col, gap_seconds)
    aggs = [
        F.count("*").alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (
            (_us(F.max(ts_col)) - _us(F.min(ts_col)))
            / 1_000_000.0
        ).alias("duration_sec"),
    ]
    if value_col is not None:
        aggs.append(F.round(F.sum(value_col), 2).alias("sum_value"))
    return s.groupBy(key_col, "session_seq").agg(*aggs)


def session_sequences(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    token_col: str,
    gap_seconds: float,
) -> DataFrame:
    """Per-session ordered token sequences: the behavioral-sequence
    corpus (next-event-prediction / session-embedding training data) —
    ``(key, session_start, n_events, sequence)`` with ``sequence`` the
    session's ``token_col`` values joined by spaces in (ts, token)
    order. Builds on :func:`sessionize`'s gap rule, so the session
    boundaries are bit-identical to the stats operator's.

    The collect_list rides the same (key, session) exchange as the
    aggregate and is bounded by the session length (watermark-bounded
    in the streaming form); ordering happens row-locally via
    array_sort over (ts, token) structs — a deterministic total order
    even under equal timestamps.
    """
    sess = sessionize(events, key_col, ts_col, gap_seconds)
    agg = (
        sess.groupBy(F.col(key_col).alias("key"), F.col("session_seq"))
        .agg(
            F.min(ts_col).alias("session_start"),
            F.count("*").alias("n_events"),
            F.array_sort(
                F.collect_list(F.struct(F.col(ts_col).alias("t"), F.col(token_col).alias("tok")))
            ).alias("__ord"),
        )
    )
    return agg.select(
        "key",
        "session_start",
        "n_events",
        F.array_join(F.expr("transform(__ord, s -> s.tok)"), " ").alias("sequence"),
    )
