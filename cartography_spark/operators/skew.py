"""Skew handling: salted repartitioning and salted aggregation for hot
keys (popular domains/entities — the web-scale Zipf reality).

AQE's skew-join splitting (enabled in session.py) handles most cases at
runtime; explicit salting is for the two places AQE can't help:
- a groupBy where one key holds a large share of all rows (partial
  aggregation helps, but the final reduce of a mega-key still lands on
  one task when the per-key state is large, e.g. collect_set);
- a join against a hot key where the build side can't broadcast.

``salted_agg`` implements the classic two-phase aggregate:
groupBy(key, salt) -> partial -> groupBy(key) -> final. Correct for
decomposable aggregates (sum/count/min/max).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def with_salt(df: DataFrame, buckets: int, col_name: str = "__salt") -> DataFrame:
    """Uniform deterministic salt in [0, buckets) — derived from the
    whole row (monotonically_increasing_id is partition-dependent;
    rand() breaks retry idempotence).

    Caveat: rows identical in EVERY column hash to the same salt, so a
    hot key consisting of byte-identical duplicate rows will not
    spread. Any deterministic, retry-stable salt has this property (the
    duplicates are indistinguishable); if that shape matters, dedup (or
    pre-count) the exact duplicates first — exact-dup collapse is
    itself a decomposable aggregate and removes the skew at the
    source."""
    return df.withColumn(
        col_name, F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(buckets))
    )


def salted_repartition(df: DataFrame, key: str, buckets: int) -> DataFrame:
    """Repartition by (key, salt): splits a hot key over ``buckets``
    tasks while keeping co-location for everything else."""
    return with_salt(df, buckets).repartition(F.col(key), F.col("__salt")).drop("__salt")


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs``: out_col -> (fn, in_col) with fn in {sum, count, min, max}.
    Phase 1 aggregates per (keys..., salt); phase 2 re-aggregates the
    ``buckets`` partials per key — the hot key's reduce is spread over
    ``buckets`` tasks in phase 1 and the final combine touches only
    ``buckets`` rows.
    """
    partial_fns = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    final_fn = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    for fn, _ in aggs.values():
        if fn not in partial_fns:
            raise ValueError(f"non-decomposable aggregate {fn!r}")
    salted = with_salt(df, buckets)
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[partial_fns[fn](c).alias(out) for out, (fn, c) in aggs.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[final_fn[fn](out).alias(out) for out, (fn, _) in aggs.items()]
    )


def top_keys(df: DataFrame, key: str, min_share: float = 0.01) -> DataFrame:
    """Identify hot keys holding >= min_share of all rows (driver-side
    decision input for broadcast-vs-salt planning)."""
    total = df.count()
    return (
        df.groupBy(key)
        .agg(F.count("*").alias("n"))
        .where(F.col("n") >= F.lit(int(total * min_share)))
        .orderBy(F.col("n").desc())
    )
