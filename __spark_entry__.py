"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship KG-construction flow on sf0.001;
``queries``/``oracle_sql`` expose the operator catalog (one entry per
implemented operator family from SURVEY.md §2) with DuckDB oracle SQL
twins — see ``cartography_spark/queries/``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship on sf0.001: documents -> mention triples -> entity-link
    to a vocabulary -> aggregated KG edge weights per (source, term)."""
    from cartography_spark.functions.triples import extract_mentions

    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    vocab = ["spark", "join", "merge", "filter", "scan", "hash", "sort", "agg"]
    mentions = extract_mentions(docs, "doc_id", "text", vocab)
    return (
        mentions.join(docs.select("doc_id", "source"), mentions["subj_id"] == F.col("doc_id"))
        .groupBy("source", "obj")
        .agg(F.sum("n_mentions").alias("weight"), F.count("*").alias("n_docs"))
        .orderBy(F.col("weight").desc(), "source", "obj")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from cartography_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from cartography_spark.queries import ORACLES

    return dict(ORACLES)
