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


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 relevance of every document against a bag of query terms
    (Robertson/Lucene idf form): returns ``(id, score)`` for documents
    containing at least one query term, where

        score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·len/avglen))
        idf(t) = ln( (N − df(t) + 0.5) / (df(t) + 0.5) + 1 )

    ``len`` is the document's full whitespace token count (not just
    query terms); ``avglen`` its corpus mean.

    Scale shape: the query-term ``IN`` filter pushes below the token
    explode, so only matching tokens survive the (doc, term) aggregate
    — the shuffle is bounded by query-term occurrences, never the
    corpus token stream. ``df`` and ``avglen`` are a query-sized dim
    and a 1-row aggregate, both broadcast; scoring is row-local.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    n_docs = docs.count()  # 1-row driver aggregate
    lens = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.split(F.col(text_col), " ")).cast("double").alias("dl"),
    )
    avgdl = lens.agg(F.avg("dl").alias("avgdl"))
    tf = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.col(text_col), " ")).alias("term"),
        )
        .where(F.col("term").isin(list(query_terms)))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    idf = tf.groupBy("term").agg(
        F.log(
            (F.lit(float(n_docs)) - F.count("*") + F.lit(0.5))
            / (F.count("*") + F.lit(0.5))
            + F.lit(1.0)
        ).alias("idf")
    )
    return (
        tf.join(F.broadcast(idf), "term")
        .join(lens, "doc_id")
        .crossJoin(F.broadcast(avgdl))
        .select(
            "doc_id",
            (
                F.col("idf")
                * (F.col("tf") * F.lit(k1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
                )
            ).alias("s"),
        )
        .groupBy("doc_id")
        .agg(F.sum("s").alias("score"))
    )


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


def cooccurrence_pmi(pairs: DataFrame, id_col: str, term_col: str) -> DataFrame:
    """Pointwise mutual information between terms co-occurring in the
    same document: for each unordered term pair (a < b),

        pmi  = ln( n_pair · N / (n_a · n_b) )
        npmi = pmi / ln( N / n_pair )          (1 = always together,
                                                0 = independent, <0 = repel)

    over DISTINCT (document, term) incidences — ``n_a`` is a's document
    frequency, ``n_pair`` the pair's, ``N`` the corpus document count.
    Returns ``(term_a, term_b, n_pair, pmi, npmi)``. The classic
    association signal for relation mining / phrase detection over an
    extracted KG vocabulary (which entity pairs co-occur more than
    chance predicts).

    Scale shape: one distinct over (doc, term) — map-side combined —
    then the pair enumeration self-joins on the document id, so
    per-document fan-out is (terms-in-doc choose 2): bounded by the
    per-doc vocabulary, never the corpus (the wedge-enumeration shape
    of ``graphrank.triangle_count``, with the doc as the center). Term
    document frequencies are a vocabulary-sized dim, broadcast twice;
    every float op is a ratio of exact integer counts, so both engines
    see identical doubles into the final ln.
    """
    inc = pairs.select(
        F.col(id_col).alias("doc"), F.col(term_col).alias("term")
    ).distinct()
    n_docs = inc.select("doc").distinct().count()  # 1-row driver aggregate
    df_t = inc.groupBy("term").agg(F.count("*").alias("n")).localCheckpoint()
    a = inc.select("doc", F.col("term").alias("term_a"))
    b = inc.select("doc", F.col("term").alias("term_b"))
    co = (
        a.join(b, "doc")
        .where(F.col("term_a") < F.col("term_b"))
        .groupBy("term_a", "term_b")
        .agg(F.count("*").alias("n_pair"))
    )
    out = (
        co.join(
            F.broadcast(df_t.select(F.col("term").alias("term_a"), F.col("n").alias("n_a"))),
            "term_a",
        )
        .join(
            F.broadcast(df_t.select(F.col("term").alias("term_b"), F.col("n").alias("n_b"))),
            "term_b",
        )
    )
    pmi = F.log(F.col("n_pair") * F.lit(n_docs) / (F.col("n_a") * F.col("n_b")))
    npmi = pmi / F.log(F.lit(n_docs) / F.col("n_pair"))
    return out.select(
        "term_a",
        "term_b",
        "n_pair",
        pmi.alias("pmi"),
        # A pair present in EVERY document has ln(N/n_pair) = 0; define
        # npmi = 1 there (the "always together" limit).
        F.when(F.col("n_pair") == n_docs, F.lit(1.0)).otherwise(npmi).alias("npmi"),
    )
