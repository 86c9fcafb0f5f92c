"""Per-partition error quarantine (S3).

The reference tolerates per-region/per-record API failures by returning
``[]`` and aggregating errors instead of aborting
(``cartography/util.py:258-306`` ``aws_handle_regions``;
``intel/aws/__init__.py:222-238`` best-effort account loop). The Spark
analog for *parse* failures inside an Arrow stage: wrap the batch
transform per row-group in try/except and route failures to a
quarantine column instead of failing the task — the sync continues,
the quarantined rows land in a dead-letter output.

(Task-level retries — the reference's backoff — are Spark-native:
``spark.task.maxFailures``.)
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F


def quarantined_stage(
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    out_cols: list[str],
    passthrough: list[str] | None = None,
):
    """Wrap a per-batch transform: good rows -> ``fn``'s output columns
    + error=null; a failing batch falls back row-by-row so only the
    poisoned rows quarantine (error=repr, outputs null).

    ``passthrough`` names INPUT columns copied verbatim onto every
    output row (they lead the output schema, before ``out_cols`` and
    ``error``). Without it a dead-letter row is all-null + error — it
    records THAT a row poisoned the batch but not WHICH, so it can
    neither be traced to its source record nor reprocessed (the
    reference's error path keeps the failing region/record id:
    ``cartography/util.py:258-306``). Pass the id/url column here for
    any stage feeding a real dead-letter sink. Requires ``fn`` to be
    row-aligned (one output row per input row) — fan-out transforms
    can't carry a per-row passthrough and must embed the id in their
    own output instead."""
    keep = list(passthrough or [])

    def _attach(out: pd.DataFrame, src: pd.DataFrame) -> pd.DataFrame:
        if keep and len(out) != len(src):
            raise ValueError(
                f"passthrough requires a row-aligned transform: "
                f"{len(src)} rows in, {len(out)} out"
            )
        # positional copy (to_numpy), never index-aligned: fn may return
        # a fresh default-indexed frame for a sliced input batch.
        for c in reversed(keep):
            out.insert(0, c, src[c].to_numpy())
        return out

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            try:
                out = _attach(fn(pdf), pdf)
                out["error"] = None
                yield out
                continue
            except Exception:  # noqa: BLE001 — fall back to row-level isolation
                pass
            rows = []
            for i in range(len(pdf)):
                single = pdf.iloc[i : i + 1]
                try:
                    good = _attach(fn(single), single)
                    good["error"] = None
                    rows.append(good)
                except Exception as e:  # noqa: BLE001
                    bad = pd.DataFrame({c: [None] for c in out_cols})
                    bad = _attach(bad, single)
                    bad["error"] = repr(e)
                    rows.append(bad)
            yield pd.concat(rows, ignore_index=True)

    return run


def split_quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good_rows_without_error_col, dead_letter_rows)."""
    good = df.where(F.col("error").isNull()).drop("error")
    bad = df.where(F.col("error").isNotNull())
    return good, bad
