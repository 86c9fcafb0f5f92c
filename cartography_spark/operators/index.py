"""Inverted-index construction: term -> (document frequency, sorted
capped posting list). The retrieval-side sink of a curated corpus —
after dedup/curation, serving BM25-ish lookup or building negatives
for retrieval training needs exactly this layout.

The reference's analog is its auto-created per-label property indexes
(``cartography/graph/statement.py`` index-creation statements) — the
store side of "make lookups by value fast"; here the corpus is the
table and terms are the key.

Scale shape: one distinct over (term, doc) pairs (map-side combined),
then everything groups/windows on ``term`` — a single hash exchange.
The posting CAP bounds what is collected per term (an uncapped
stopword posting list is corpus-sized — the classic index-build
killer); the per-term window sort under the cap is the inherent cost
of ORDERED postings, and AQE's skew handling splits oversized term
partitions for the sort itself. ``df`` (document frequency) is always
the FULL count, computed beside the cap, so ranking signals are not
truncated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def build_postings(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_postings: int = 1000,
) -> DataFrame:
    """Build ``(term, df, postings)`` from whitespace tokens of
    ``text_col``: ``df`` = number of distinct documents containing the
    term, ``postings`` = the ``max_postings`` smallest ``id_col``
    values containing it, ascending (deterministic cap — the keep-set
    is a pure function of the data, not of partition order)."""
    if max_postings <= 0:
        raise ValueError(f"max_postings must be positive, got {max_postings}")
    pairs = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.col(text_col), " ")).alias("term"),
        )
        .where(F.col("term") != "")
        .distinct()
    )
    w = Window.partitionBy("term").orderBy("doc_id")
    capped = (
        pairs.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= max_postings)
        .groupBy("term")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("postings"))
    )
    full = pairs.groupBy("term").agg(F.count("*").alias("df"))
    return full.join(capped, "term").select("term", "df", "postings")
