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


def test_triple_precision_recall_vs_reference(spark):
    """North-rule criterion: (subj, pred, obj) P/R >= 0.95 vs the
    reference extraction. The reference triples are extracted from the
    generator's GOLDEN text column; the pipeline extracts from html.
    Both per (url, subj, pred, obj)."""
    pages = synthesize_pages(spark, 400, seed=77)
    reference = extract_triples_jvm(pages.select("url", "warc_ts", "text"))
    pipeline = extract_triples(extract_text(pages.drop("text"), "html", "text"))
    ref_n = reference.count()
    pipe_n = pipeline.count()
    false_pos = pipeline.exceptAll(reference).count()
    false_neg = reference.exceptAll(pipeline).count()
    precision = (pipe_n - false_pos) / pipe_n
    recall = (ref_n - false_neg) / ref_n
    assert precision == 1.0 and recall == 1.0


def test_extraction_matches_golden_text(spark):
    """The extractor's output must equal the generator's golden text
    byte for byte, per url, at any partitioning."""
    for parts in (2, 13):
        pages = synthesize_pages(spark, 200, seed=3, partitions=parts)
        got = extract_text(pages.select("url", "html"), "html", "text")
        joined = got.alias("g").join(pages.select("url", "text").alias("p"), "url")
        mismatch = joined.where("g.text <> p.text").count()
        assert mismatch == 0
