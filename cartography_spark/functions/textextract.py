"""Deterministic html -> text extraction (trafilatura-style main-content
extraction, simplified to the engine's page template).

Reference analog: the per-row ``transform()`` layer (e.g.
``cartography/intel/aws/ec2/instances.py:62-198``) — every per-row
Python in the reference becomes a vectorized Arrow/pandas stage here.

Contract (BASELINE.json input_hint): the extracted ``text`` must be
byte-identical per url across runs, Arrow batch boundaries, and
parallelism levels. The implementation is pure string processing with
no locale, hash-order, or RNG dependence, and is pinned by golden
byte-hash tests (tests/test_triples_paths.py).

Scale: runs as ``mapInPandas`` so html bytes stream through Arrow in
columnar batches; the html column is never shuffled (extraction happens
in the scan stage, before any wide transform).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

_PARA_RE = re.compile(r"<p>(.*?)</p>", re.DOTALL)
_DROP_BLOCKS_RE = re.compile(
    r"<(script|style|nav|footer|header|aside)\b.*?</\1>", re.DOTALL | re.IGNORECASE
)


def extract_text_str(html: str) -> str:
    """Main-content extraction for one document (deterministic).

    Drops script/style/nav/footer/header/aside blocks, then joins the
    text of ``<p>`` blocks with a single space. No entity un-escaping
    (the synthetic corpus contains none in content); no whitespace
    normalization inside paragraphs (byte-identity).
    """
    cleaned = _DROP_BLOCKS_RE.sub("", html)
    return " ".join(_PARA_RE.findall(cleaned))


def _extract_batch(html: pd.Series) -> pd.Series:
    decoded = html.map(lambda b: b.decode("utf-8", errors="replace") if b is not None else "")
    return decoded.map(extract_text_str)


def extract_text_stage(
    keep: list[str], html_col: str = "html", out_col: str = "text"
):
    """Fusable Arrow stage (see functions/fuse.py): pages batches ->
    batches of ``keep`` columns + extracted ``out_col``; the heavy html
    binary never leaves the Python worker."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[keep].copy()
            out[out_col] = _extract_batch(pdf[html_col])
            yield out

    return run


def extract_text(df: DataFrame, html_col: str = "html", out_col: str = "text") -> DataFrame:
    """Add ``out_col`` = extracted main text of binary ``html_col``.

    Implemented with mapInPandas (Arrow batches) rather than a scalar
    pandas_udf so the html column can be dropped in the same pass —
    keeps the heavy binary column out of every downstream shuffle.
    """
    out_fields = [f for f in df.schema.fields if f.name not in (html_col, out_col)]
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in out_fields)
    schema = schema + f", {out_col} string"
    keep = [f.name for f in out_fields]
    return df.mapInPandas(extract_text_stage(keep, html_col, out_col), schema=schema)
