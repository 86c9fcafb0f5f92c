"""Sequence packing: lay a document corpus out as one concatenated
token stream and chunk it into fixed-capacity context windows — the
standard GPT-style pretraining layout (documents cross window
boundaries; nothing is padded or dropped).

The reference has no analog (it ships assets to a graph, not tokens to
a trainer); this is part of the training-data extension mandated by the
build contract, downstream of the dedup/curation funnel: after
curation, the surviving corpus must be assigned to context windows
deterministically so shards can be built in parallel.

Scale design — the whole operator is a GLOBAL PREFIX SUM, and the
naive Spark spelling (`Window.orderBy(...)` with no partitionBy) plans
a single-partition window: every row of a 100 TB corpus through ONE
task. Instead this module implements the classic two-pass distributed
scan:

1. range-repartition + in-partition sort on the order key (ONE
   exchange — the same lower bound as any global ordering), stamp
   ``spark_partition_id``, and materialize;
2. aggregate one total per partition — O(#partitions) rows to the
   driver, bounded by cluster width, never by data — compute the
   per-partition starting offsets on the driver, and broadcast them
   back as a tiny (pid, offset) dim;
3. in-partition window cumsum + the broadcast offset.

Range partition ids ascend with the key, so the pid-ordered prefix of
partition totals IS the global prefix. Output is independent of the
partition count (boundaries only move which pass-3 task computes a
row, never its value) — pinned by test.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


def global_prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "prefix_sum",
    partitions: int | None = None,
) -> DataFrame:
    """Exclusive prefix sum of ``value_col`` over the total order given
    by ``order_col`` (which must be UNIQUE — ties straddling a range
    boundary would make the scan order ambiguous). Adds ``out_col`` =
    sum of all earlier rows' values; all other columns pass through.
    """
    spark = df.sparkSession
    if partitions is None:
        partitions = spark.sparkContext.defaultParallelism
    staged = (
        df.repartitionByRange(partitions, F.col(order_col))
        .sortWithinPartitions(order_col)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint()
    )
    # O(#partitions) rows — bounded by cluster width, not data size.
    totals = {
        r["__pid"]: r["t"]
        for r in staged.groupBy("__pid").agg(F.sum(value_col).alias("t")).collect()
    }
    offsets, acc = [], 0
    for pid in sorted(totals):
        offsets.append((pid, acc))
        acc += int(totals[pid])
    off_df = spark.createDataFrame(offsets or [(0, 0)], "__pid int, __p_off long")
    w = (
        Window.partitionBy("__pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        staged.join(F.broadcast(off_df), "__pid")
        .withColumn(
            out_col,
            (F.sum(value_col).over(w) - F.col(value_col) + F.col("__p_off")).cast("long"),
        )
        .drop("__pid", "__p_off")
    )


def shard_assignment(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Deterministic pseudo-random shard + within-shard order for
    reproducible training shards: ``shard`` = first 8 md5 hex digits of
    ``salt || id`` mod ``n_shards``; ``position`` = 0-based rank of the
    full md5 digest (id tie-break) inside the shard. Adds both columns;
    everything else passes through.

    This is the training-data "global shuffle" — the order a trainer
    reads is a pure function of (salt, id), identical across runs,
    retries, and cluster sizes; epoch reshuffles are a salt change, not
    a data move. md5 (not xxhash64) so the driver oracle re-derives
    membership hex-identically in DuckDB — the same tradeoff as
    ``curation.sample_bucket``, whose bucket idiom this reuses. Scale
    shape: ONE hash exchange on shard + an in-partition sort (the
    sort's input per task is one shard ≈ corpus/n_shards — n_shards is
    sized so a shard fits a task, which a real shard build needs
    anyway to write it as one file).
    """
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    digest = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    shard = (
        F.conv(F.substring(digest, 1, 8), 16, 10).cast("long") % n_shards
    ).cast("int")
    w = Window.partitionBy("shard").orderBy("__digest", id_col)
    return (
        df.withColumn("__digest", digest)
        .withColumn("shard", shard)
        .withColumn("position", (F.row_number().over(w) - F.lit(1)).cast("long"))
        .drop("__digest")
    )


def pack_documents(
    docs: DataFrame,
    capacity: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    size_col: str | None = None,
    partitions: int | None = None,
) -> DataFrame:
    """Assign every document its place in the concat-then-chunk token
    stream: ``(id, n_tokens, start_offset, bin, bin_offset,
    n_bins_spanned)`` where ``bin = start_offset div capacity`` is the
    context window holding the document's first token and
    ``n_bins_spanned`` counts the windows it crosses.

    Concatenation order is ``id_col`` ascending (unique ids are the
    caller's contract). Sizes come from ``size_col`` if given, else the
    whitespace ``token_count`` of ``text_col`` (the corpus-standard
    tokenizer stand-in from ``functions/textstats.py``).
    """
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    if size_col is None:
        from cartography_spark.functions.textstats import token_count

        sized = docs.select(
            F.col(id_col), token_count(text_col).cast("long").alias("n_tokens")
        )
    else:
        sized = docs.select(F.col(id_col), F.col(size_col).cast("long").alias("n_tokens"))
    scanned = global_prefix_sum(
        sized, order_col=id_col, value_col="n_tokens",
        out_col="start_offset", partitions=partitions,
    )
    cap = F.lit(capacity)

    def _div(c: Column) -> Column:
        return (c - c % cap) / cap

    return scanned.select(
        F.col(id_col),
        "n_tokens",
        "start_offset",
        _div(F.col("start_offset")).cast("long").alias("bin"),
        (F.col("start_offset") % cap).cast("long").alias("bin_offset"),
        F.when(F.col("n_tokens") == 0, F.lit(0))
        .otherwise(
            _div(F.col("start_offset") + F.col("n_tokens") - F.lit(1))
            - _div(F.col("start_offset"))
            + F.lit(1)
        )
        .cast("long")
        .alias("n_bins_spanned"),
    )
