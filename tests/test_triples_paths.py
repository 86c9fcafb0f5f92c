"""The pandas (Arrow UDF) and JVM (codegen regex) triple extractors must
be output-identical; extraction must be byte-identical per url across
partitionings (the engine's per-row invariant)."""

from __future__ import annotations

import pytest

from cartography_spark.functions.textextract import extract_text
from cartography_spark.functions.triples import extract_triples, extract_triples_jvm
from cartography_spark.sources.pages import synthesize_pages


@pytest.fixture(scope="module")
def text_df(spark):
    pages = synthesize_pages(spark, 300, seed=11)
    return extract_text(pages.drop("text"), "html", "text").cache()


def test_jvm_and_pandas_paths_identical(text_df):
    a = extract_triples(text_df)
    b = extract_triples_jvm(text_df)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
    assert a.count() > 0


def test_fused_pipeline_identical_to_modular(spark):
    from cartography_spark.pipeline.flagship import page_triples, page_triples_fused

    a = page_triples(spark, 250, seed=9)
    b = page_triples_fused(spark, 250, seed=9, partitions=5)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
    assert b.count() > 0


def test_extraction_matches_golden_text(spark):
    """The extractor's output must equal the generator's golden text
    byte for byte, per url, at any partitioning."""
    for parts in (2, 13):
        pages = synthesize_pages(spark, 200, seed=3, partitions=parts)
        got = extract_text(pages.select("url", "html"), "html", "text")
        joined = got.alias("g").join(pages.select("url", "text").alias("p"), "url")
        mismatch = joined.where("g.text <> p.text").count()
        assert mismatch == 0
