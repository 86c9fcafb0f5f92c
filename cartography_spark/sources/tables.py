"""Parquet source readers for the driver-generated test tables.

Reference analog: the paginated "get" layer (``cartography/util.py:209-234``
``aws_paginate``) — in the Spark engine the "API" is a columnar table scan,
so filters/projections push down to the parquet reader (check with
``.explain``: ``PushedFilters`` / ``ReadSchema``). At 100 TB the same call
becomes ``spark.read.format("iceberg").load(...)`` with partition pruning
on crawl id / ``warc_ts``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view for spark.sql queries."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
