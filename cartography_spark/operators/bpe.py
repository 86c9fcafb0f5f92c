"""BPE tokenizer training over the corpus: learn the first ``k``
byte-pair-encoding merge rules (Sennrich et al. 2016) — the
tokenizer-construction stage of a web-scale training-data pipeline.

The classic trick makes this tractable at 10^12 documents: BPE
statistics depend only on the WORD-FREQUENCY table, not the corpus.
One corpus-sized shuffle builds (word, freq); every merge round after
that runs on the vocabulary (~10^8 rows at web scale, distributed but
thousands of times smaller than the corpus).

Per round, entirely as DataFrame ops:
- pair counts: row-local ``zip_with`` of the symbol list with its
  shift (all adjacent occurrences count, per Sennrich's ``get_stats``)
  -> explode -> ONE vocab-sized hash shuffle with map-side combine;
- best pair: partial-aggregated ``min(struct(-count, left, right))``
  — a 1-row aggregate, never a global sort (count-desc, pair-asc
  tie-break makes every round deterministic);
- merge application: the 1-row best is LEFT broadcast-joined onto the
  vocab (left, so an exhausted corpus degrades to a no-op instead of
  vanishing), then a row-local ``F.aggregate`` fold walks each word's
  symbols left-to-right, greedily merging non-overlapping (L, R)
  occurrences — O(len) per word, inside codegen, no Python;
- ``localCheckpoint`` after each round truncates lineage (the same
  deep-iteration discipline as operators/components.py and
  graphrank.py), so the k-round plan never cascades.

The DuckDB oracle twin (queries/oracles.py::_bpe_oracle_sql) applies
each merge with a DIFFERENT algorithm — a match-run parity rule over
the original symbol list (position p merges iff it matches (L, R) and
an even number of consecutive matches immediately precede it in its
run) — so a green hash cross-checks the greedy-left-scan semantics
themselves, not a shared implementation.

Reference analog: none (SURVEY §2 "beyond the reference" family); the
reference ingests structured APIs and never tokenizes. This sits with
operators/packing.py (sequence packing) as the corpus->trainer
boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def word_frequencies(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, freq) over the whitespace-lowered token stream — the one
    corpus-sized pass; everything downstream is vocab-sized."""
    toks = F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("word")
    return (
        docs.select(toks)
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _initial_symbols(words: DataFrame) -> DataFrame:
    """Seed the working frame: each word as its character list."""
    return words.select(
        "word",
        "freq",
        F.expr(
            "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
        ).alias("syms"),
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """(left, right, cnt): every adjacent symbol-pair occurrence,
    weighted by word frequency. Row-local pair building; one
    vocab-sized shuffle with map-side combine."""
    n1 = F.greatest(F.size("syms") - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice("syms", 1, n1),
        F.slice("syms", 2, n1),
        lambda a, b: F.struct(a.alias("l"), b.alias("r")),
    )
    return (
        vocab.select("freq", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.l").alias("left"), F.col("p.r").alias("right"))
        .agg(F.sum("freq").alias("cnt"))
    )


def _best_pair(counts: DataFrame) -> DataFrame:
    """1-row (left, right, cnt) argmax: count desc, (left, right) asc."""
    picked = counts.agg(
        F.min(
            F.struct(
                (-F.col("cnt")).alias("neg"),
                F.col("left").alias("left"),
                F.col("right").alias("right"),
            )
        ).alias("__b")
    )
    return picked.select(
        F.col("__b.left").alias("__L"),
        F.col("__b.right").alias("__R"),
        (-F.col("__b.neg")).alias("__cnt"),
    ).where(F.col("__L").isNotNull())


def _apply_merge(vocab: DataFrame, best: DataFrame) -> DataFrame:
    """Replace every greedy-left non-overlapping (L, R) occurrence in
    each word's symbol list with the merged symbol. Row-local fold
    (state = (accumulated list, consumed-next flag)); LEFT broadcast
    join so an empty ``best`` leaves the vocab untouched."""
    joined = vocab.join(F.broadcast(best), F.lit(True), "left")
    syms, L, R = F.col("syms"), F.col("__L"), F.col("__R")
    merged = F.aggregate(
        F.sequence(F.lit(1), F.size(syms)),
        F.struct(
            F.array().cast("array<string>").alias("acc"),
            F.lit(False).alias("skip"),
        ),
        # F.get is 0-based and NULL-safe past the end (ANSI element_at
        # would throw at the final position's i+1 lookahead); a NULL
        # lookahead fails the == and falls through to the keep branch.
        lambda st, i: F.when(
            st.skip,
            F.struct(st.acc.alias("acc"), F.lit(False).alias("skip")),
        )
        .when(
            (F.get(syms, i - 1) == L) & (F.get(syms, i) == R),
            F.struct(
                F.concat(st.acc, F.array(F.concat(L, R))).alias("acc"),
                F.lit(True).alias("skip"),
            ),
        )
        .otherwise(
            F.struct(
                F.concat(st.acc, F.array(F.get(syms, i - 1))).alias("acc"),
                F.lit(False).alias("skip"),
            )
        ),
        lambda st: st.acc,
    )
    return joined.select(
        "word",
        "freq",
        F.when(L.isNull(), syms).otherwise(merged).alias("syms"),
    )


def bpe_merge_rules(
    docs: DataFrame, k: int = 8, text_col: str = "text"
) -> DataFrame:
    """Learn the first ``k`` BPE merges; returns one row per learned
    rule: (merge_rank, left, right, pair_count, merged) with
    merge_rank 1-based in learn order. Fewer than ``k`` rows come back
    iff the vocabulary exhausts (no pair left to merge).
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    vocab = _initial_symbols(word_frequencies(docs, text_col)).localCheckpoint()
    rules: list[DataFrame] = []
    for rank in range(1, k + 1):
        best = _best_pair(_pair_counts(vocab)).localCheckpoint()
        rules.append(
            best.select(
                F.lit(rank).alias("merge_rank"),
                F.col("__L").alias("left"),
                F.col("__R").alias("right"),
                F.col("__cnt").alias("pair_count"),
                F.concat("__L", "__R").alias("merged"),
            )
        )
        vocab = _apply_merge(vocab, best).localCheckpoint()
    out = rules[0]
    for r in rules[1:]:
        out = out.unionAll(r)
    return out


def bpe_segment(vocab: DataFrame, rules: DataFrame) -> DataFrame:
    """Apply learned rules (in merge_rank order) to a (word, freq,
    syms) frame — the encode side. Rules are collected to the driver
    (k rows, k is tokenizer-sized: tens of thousands at most) and
    applied as k chained row-local folds.
    """
    ordered = sorted(
        rules.select("merge_rank", "left", "right", "pair_count").collect(),
        key=lambda r: r["merge_rank"],
    )
    spark = vocab.sparkSession
    for i, row in enumerate(ordered):
        best = spark.createDataFrame(
            [(row["left"], row["right"], row["pair_count"])],
            "__L string, __R string, __cnt long",
        )
        vocab = _apply_merge(vocab, best)
        if (i + 1) % 4 == 0:
            vocab = vocab.localCheckpoint()
    return vocab
