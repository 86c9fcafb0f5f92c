"""The flagship KG-construction pipeline, modular and fused forms.

Modular: synthesize -> extract_text -> extract_triples as three chained
mapInPandas stages (each independently reusable/testable).

Fused: the same three batch generators composed into ONE mapInPandas
(functions/fuse.py) — one Python worker per task slot, one Arrow
round-trip. On 32 pinned cores the fused form is ~4x faster than the
chain and, unlike the chain, scales with cores (see BASELINE.md
scaling table). Output is row-identical to the modular form
(tests/test_triples_paths.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cartography_spark.functions.fuse import apply_fused
from cartography_spark.functions.textextract import extract_text, extract_text_stage
from cartography_spark.functions.triples import (
    TRIPLES_SCHEMA,
    extract_triples,
    extract_triples_stage,
)
from cartography_spark.sources.pages import synthesize_pages, synthesize_pages_stage


def page_triples(spark: SparkSession, n: int, seed: int = 42,
                 partitions: int | None = None) -> DataFrame:
    """Modular chain (3 Arrow stages)."""
    pages = synthesize_pages(spark, n, seed=seed, partitions=partitions)
    text = extract_text(pages.drop("text"), "html", "text")
    return extract_triples(text)


def page_triples_fused(spark: SparkSession, n: int, seed: int = 42,
                       partitions: int | None = None) -> DataFrame:
    """Fused single Arrow stage — the production/scale form."""
    if partitions is None:
        partitions = spark.sparkContext.defaultParallelism
    base = spark.range(0, n, 1, partitions)
    return apply_fused(
        base,
        TRIPLES_SCHEMA,
        synthesize_pages_stage(seed),
        extract_text_stage(["url", "warc_ts"], "html", "text"),
        extract_triples_stage("text"),
    )
