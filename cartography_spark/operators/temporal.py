"""Temporal joins for event / page-version data: a distributed as-of
join.

Spark has no native ASOF JOIN (pandas ``merge_asof``, DuckDB ``ASOF
JOIN``, kdb ``aj`` are single-node); the reference has no temporal
joins at all (SURVEY.md §2 "NOT PRESENT" row — join strategy is
delegated to Neo4j). For web-scale page data the as-of question is
constant: "which crawl snapshot of this url was current at time T?",
"which view preceded this click?". The distributed formulation here is
the union-tag + partitioned carry-forward window:

1. tag versions (side 0) and queries (side 1), union on (key, ts);
2. ONE hash exchange on the key + one sort on (ts, side) within each
   partition — the same lower bound as a sort-merge equi-join;
3. ``last(payload, ignorenulls=True)`` over
   ``rowsBetween(unboundedPreceding, currentRow)`` carries the newest
   at-or-before version onto every query row (ties at equal ts put the
   version row first, so at-or-before INCLUDES equality — DuckDB
   ``ON q.ts >= v.ts`` semantics);
4. keep the side-1 rows.

No range explosion, no cross product, no per-row Python. Hot keys (a
url/domain with millions of versions) stay within one partition's
sort — the standard window skew profile; AQE cannot split a window
partition, so pre-filter versions (time-range prune) if a single key's
history exceeds executor memory.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


def ts_micros(c: Column | str) -> Column:
    """Microseconds since epoch; the cast accepts TIMESTAMP_NTZ inputs
    (parquet event times) — value-preserving under the session's pinned
    UTC timezone. Shared by the temporal operators, sessionization, and
    the streaming session aggregate (one definition, not three)."""
    c = F.col(c) if isinstance(c, str) else c
    return F.unix_micros(c.cast("timestamp"))


_us = ts_micros


def asof_join(
    versions: DataFrame,
    queries: DataFrame,
    on: str | list[str],
    version_ts: str,
    query_ts: str,
    payload: list[str],
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """LEFT as-of join: every ``queries`` row, plus ``payload`` columns
    from the single ``versions`` row with the newest ``version_ts`` at
    or before that row's ``query_ts`` (``direction="backward"``; with
    ``"forward"``, the oldest at or after). Unmatched queries keep NULL
    payload (left-join semantics). ``tolerance_seconds`` additionally
    nulls the payload when the matched version is further than that
    from the query timestamp.

    Preconditions: ``payload`` column names must not collide with
    ``queries`` columns, and (for a deterministic winner) versions
    should be unique per (key, version_ts) — pre-dedup with a
    last-wins groupBy if they are not.
    """
    keys = [on] if isinstance(on, str) else list(on)
    clash = (set(payload) | {"matched_ts"}) & set(queries.columns)
    if clash:
        raise ValueError(f"payload columns collide with query columns: {sorted(clash)}")
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction {direction!r}")

    v_struct = F.struct(
        F.col(version_ts).alias("__v_ts"), *[F.col(c) for c in payload]
    )
    v_type = versions.select(v_struct.alias("x")).schema["x"].dataType
    q_cols = [c for c in queries.columns]
    q_struct = F.struct(*[F.col(c) for c in q_cols])
    q_type = queries.select(q_struct.alias("x")).schema["x"].dataType

    # NULL handling, deterministic by construction and matching the
    # DuckDB-ASOF / pandas-merge_asof contract: a version with a NULL
    # timestamp OR a NULL join key cannot match anything and is dropped
    # (NULL never equals NULL in a join — Window.partitionBy would
    # otherwise group NULL keys together and hand out phantom matches);
    # a query with NULL ts or key keeps its row with NULL payload (left
    # semantics) regardless of direction.
    v_valid = F.col(version_ts).isNotNull()
    for kcol in keys:
        v_valid = v_valid & F.col(kcol).isNotNull()
    tagged_v = versions.where(v_valid).select(
        *[F.col(k) for k in keys],
        F.col(version_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        v_struct.alias("__v"),
        F.lit(None).cast(q_type).alias("__q"),
    )
    tagged_q = queries.select(
        *[F.col(k) for k in keys],
        F.col(query_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(v_type).alias("__v"),
        q_struct.alias("__q"),
    )
    if direction == "backward":
        order = [F.col("__ts").asc(), F.col("__side").asc()]
    else:
        order = [F.col("__ts").desc(), F.col("__side").asc()]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged_v.unionByName(tagged_q).withColumn(
        "__match", F.last("__v", ignorenulls=True).over(w)
    )
    q_valid = F.col("__ts").isNotNull()
    for kcol in keys:
        q_valid = q_valid & F.col(kcol).isNotNull()
    match: Column = F.when(q_valid, F.col("__match"))
    if tolerance_seconds is not None:
        # round, not int(): 0.7*1e6 is 699999.999... and truncation
        # would shave 1µs off the inclusive boundary
        tol_us = round(tolerance_seconds * 1_000_000)
        if direction == "backward":
            gap = _us(F.col("__ts")) - _us(match["__v_ts"])
        else:
            gap = _us(match["__v_ts"]) - _us(F.col("__ts"))
        match = F.when(gap <= F.lit(tol_us), match)
    out = carried.where(F.col("__side") == 1).select(
        *[F.col("__q")[c].alias(c) for c in q_cols],
        match["__v_ts"].alias("matched_ts"),
        *[match[c].alias(c) for c in payload],
    )
    return out


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str | list[str],
    point_ts: str,
    start_ts: str,
    end_ts: str,
    payload: list[str],
    bucket_seconds: float = 86400.0,
) -> DataFrame:
    """Point-in-interval join WITHOUT a cross product or a
    BroadcastNestedLoopJoin (which is what Spark plans for the naive
    ``p.ts BETWEEN i.start AND i.end`` theta-join).

    The classic bucketized formulation: each interval explodes into the
    fixed-width time buckets it covers; each point computes its single
    bucket; an EQUI-join on (key, bucket) pairs every point with
    exactly the intervals whose bucket span covers it — each such
    interval appears once per bucket and the point joins only its own
    bucket, so no pair can duplicate and no dedup pass is needed — then
    the exact ``start <= ts <= end`` filter removes same-bucket misses.

    Cost model: the interval side inflates by ``ceil(duration /
    bucket_seconds) + 1`` rows; pick ``bucket_seconds`` near the median
    interval duration so the inflation stays ~2x while each point's
    bucket holds few intervals. Everything shuffles on (key, bucket) —
    hash-partitionable, AQE-splittable, skew-salvageable like any
    equi-join.

    Returns all ``points`` columns plus the interval ``payload``
    columns (inner semantics: points in no interval drop; a point in N
    overlapping intervals yields N rows).
    """
    keys = [on] if isinstance(on, str) else list(on)
    clash = set(payload) & set(points.columns)
    if clash:
        raise ValueError(f"payload columns collide with point columns: {sorted(clash)}")
    bucket_us = round(bucket_seconds * 1_000_000)
    i_buckets = intervals.select(
        *[F.col(k) for k in keys],
        F.col(start_ts).alias("__lo"),
        F.col(end_ts).alias("__hi"),
        *[F.col(c) for c in payload],
        F.explode(
            F.sequence(
                F.floor(_us(F.col(start_ts)) / bucket_us).cast("long"),
                F.floor(_us(F.col(end_ts)) / bucket_us).cast("long"),
            )
        ).alias("__bucket"),
    )
    p_buckets = points.withColumn(
        "__bucket", F.floor(_us(F.col(point_ts)) / bucket_us).cast("long")
    )
    joined = p_buckets.join(i_buckets, [*keys, "__bucket"])
    pt = _us(F.col(point_ts))
    return joined.where(
        (pt >= _us(F.col("__lo"))) & (pt <= _us(F.col("__hi")))
    ).select(*points.columns, *payload)
