"""Incremental source window with a persisted high-water mark (S2).

Reference: the CVE feed reads its last_modified watermark back from the
graph, then fetches only records in (watermark, now]
(``cartography/intel/cve/feed.py:35-58, 156-179``). Here the watermark
lives in the store's metrics table (one row per completed window) and
the incremental read is a pushed-down range predicate on the source
scan — verify with ``.explain``: the ``ts > watermark`` filter appears
in PushedFilters, so at Iceberg scale it prunes files/partitions.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, functions as F

from cartography_spark.store.graphstore import GraphStore

_WM_OP = "watermark"


def _source_id(source: str) -> int:
    """Stable cross-process id for a source name. Python's builtin
    ``hash(str)`` is salted per process (PYTHONHASHSEED) and must never
    key anything persisted — a restarted driver could not find its own
    watermark and would silently fall back to a full re-read."""
    return int(hashlib.md5(source.encode("utf-8")).hexdigest()[:15], 16)


def last_watermark(store: GraphStore, source: str) -> int | None:
    """Highest committed watermark (epoch micros) for ``source``."""
    m = store.read_metrics().where(
        (F.col("op") == _WM_OP) & (F.element_at("counters", "source_id").isNotNull())
    )
    row = (
        m.where(F.element_at("counters", "source_id") == F.lit(_source_id(source)))
        .agg(F.max(F.element_at("counters", "ts_micros")).alias("wm"))
        .collect()[0]
    )
    return int(row["wm"]) if row["wm"] is not None else None


def commit_watermark(store: GraphStore, source: str, update_tag: int, ts_micros: int) -> None:
    store._record_metrics(
        _WM_OP,
        update_tag,
        {"source_id": _source_id(source), "ts_micros": int(ts_micros)},
    )


def incremental_read(
    store: GraphStore,
    df: DataFrame,
    source: str,
    ts_col: str,
) -> tuple[DataFrame, int | None]:
    """Rows of ``df`` strictly newer than the committed watermark, plus
    the new candidate watermark (max ts in df, epoch micros) to commit
    after the window loads successfully. First run = full read."""
    wm = last_watermark(store, source)
    out = df
    if wm is not None:
        # Compare the BARE column against a timestamp literal (not
        # unix_micros(ts) > wm): wrapping the column in a function makes
        # the predicate un-pushable; this form lands in PushedFilters and
        # prunes parquet files/row-groups by ts min/max.
        out = df.where(F.col(ts_col) > F.timestamp_micros(F.lit(int(wm))))
    # Candidate watermark over the FILTERED window, not the full source:
    # max(ts) over rows with ts > wm equals max(ts) over all rows unless
    # the window is empty (then the old watermark stands) — and the
    # ``ts > wm`` predicate is pushed into the scan, so file/partition
    # pruning applies to the watermark aggregate too instead of a full
    # table scan (the exact thing the watermark exists to avoid).
    row = out.agg(F.max(F.unix_micros(F.col(ts_col))).alias("m")).collect()[0]
    new_wm = int(row["m"]) if row["m"] is not None else wm
    return out, new_wm
