"""SparkSession factory tuned for the KG-construction workload.

Local mode is a single JVM; on a real cluster the same confs apply, plus
``spark-submit --py-files`` packaging (reference lifecycle analog:
``cartography/cli.py`` -> ``cartography/sync.py:217-283``).

Scale notes (100 TB / 1000 executors):
- AQE on: runtime coalescing of small shuffle partitions and skew-join
  splitting replace hand-tuned partition counts.
- ``spark.sql.shuffle.partitions`` here defaults to the local core
  count; on a cluster set it to 2-3x total cores (AQE coalesces down).
- Arrow enabled: every Python-side transform in this engine is a
  vectorized pandas UDF / mapInPandas (no per-row Python anywhere),
  per the engine contract.
- Session timezone pinned to UTC so timestamps are stable across the
  oracle (DuckDB is UTC-naive) and across clusters.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "cartography-spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's standard confs.

    ``cores``: int N -> ``local[N]``; ``"*"`` -> all cores. Defaults to
    env ``SPARK_GRAFT_CPUS`` then ``*``. Used by the two-parallelism
    scaling benchmark (local[8] vs local[32]).
    """
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = f"local[{cores}]"
    if shuffle_partitions is None:
        shuffle_partitions = DEFAULT_SHUFFLE_PARTITIONS

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # Throughput GC: G1's concurrent cycles collapse under 32 mutator
        # threads of string-heavy codegen on this host (measured 76 s ->
        # 25 s on the 6M-page pipeline); batch jobs want ParallelGC.
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
