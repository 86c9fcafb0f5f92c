"""DSIR-style data selection via importance resampling (Xie et al.
2023, "Data Selection for Language Models via Importance Resampling"):
score every raw document by how much more likely its hashed n-gram
features are under a TARGET corpus distribution than under the RAW
corpus distribution, then keep the documents whose evidence says
"target-like".

The published recipe, re-expressed Spark-first:

1. Features — unigrams + bigrams of the whitespace-lowered token
   stream, hashed into ``n_buckets`` buckets (md5, so the DuckDB twin
   re-derives bucket ids hex-identically; the paper uses a 10^4-bucket
   hash for the same collision-tolerant reason).
2. Bag-of-buckets unigram model per corpus — bucket probabilities with
   Laplace(+1) smoothing over raw and target feature streams.
3. Importance weight per raw doc —
   ``sum over the doc's feature occurrences of
   ln(p_target[bucket]) - ln(p_raw[bucket])``
   (the doc's log-likelihood ratio under the two bucket models).
4. Selection — ``avg_llr > 0`` (per-feature normalized, so long docs
   aren't favored just for having more features): the document's
   features are on average more probable under the target model.
   The paper samples with Gumbel noise; a threshold on the same weight
   is its deterministic analog (no RNG in the engine — reruns and
   retries must agree bit-for-bit, same rule as every sampler here).

Scale shape (the paper targets exactly this: selecting from
Common-Crawl-scale raw pools):
- Feature extraction is scan-stage JVM work (split + transform +
  explode); the text column never survives past the scan.
- Per-doc bucket counts: ONE hash shuffle on (doc_id, bucket) with
  map-side combine.
- The two corpus distributions re-aggregate those counts by bucket —
  a second shuffle whose OUTPUT is n_buckets rows; the log-ratio table
  is then a broadcast dim (10^4 rows at any corpus size).
- Doc weights: broadcast-join the ratio table onto the per-doc counts,
  one (map-side combinable) sum per doc. No corpus-sized shuffle
  carries text, and nothing grows with corpus size except the
  doc-keyed aggregates themselves.

Reference analog: the reference has no data-selection stage (its
sources are APIs, not a raw crawl); this is part of the
training-data-pipeline family (SURVEY §2 "beyond the reference"), next
to the Gopher repetition gates in operators/curation.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def hashed_ngram_features(
    df: DataFrame,
    n_buckets: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc hashed feature-bucket counts: (id_col, bucket, n).

    Features are the unigrams and adjacent bigrams of the
    whitespace-split, lowercased token stream; bucket =
    first-8-md5-hex of the feature mod ``n_buckets`` (bigrams joined
    with a single space). Empty tokens (from repeated spaces) are
    dropped before pairing, so bigrams always span two real tokens.
    """
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), " "), lambda t: t != F.lit("")
    )
    # let-bind the token array (PLANS.md HOF idiom) so the bigram
    # zip_with never re-tokenizes: one transform carries toks through.
    grams = F.element_at(
        F.transform(
            F.array(toks),
            lambda tk: F.concat(
                tk,
                F.zip_with(
                    F.slice(tk, 1, F.greatest(F.size(tk) - 1, F.lit(0))),
                    F.slice(tk, 2, F.greatest(F.size(tk) - 1, F.lit(0))),
                    lambda a, b: F.concat_ws(" ", a, b),
                ),
            ),
        ),
        1,
    )
    exploded = df.select(
        F.col(id_col), F.explode(grams).alias("gram")
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("gram")), 1, 8), 16, 10).cast("long")
        % n_buckets
    )
    return (
        exploded.select(id_col, bucket.alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count("*").alias("n"))
    )


def bucket_distribution(features: DataFrame, n_buckets: int) -> DataFrame:
    """Laplace(+1)-smoothed bucket log-probabilities over a feature
    stream: (bucket, logp) for EVERY bucket 0..n_buckets-1 (unseen
    buckets get the smoothing floor — both corpora must emit all
    buckets or the ratio join drops rows).
    """
    spark = features.sparkSession
    counts = features.groupBy("bucket").agg(F.sum("n").alias("cnt"))
    all_buckets = spark.range(n_buckets).select(F.col("id").alias("bucket"))
    filled = all_buckets.join(counts, "bucket", "left").select(
        "bucket", F.coalesce("cnt", F.lit(0)).alias("cnt")
    )
    total = filled.agg(F.sum("cnt").alias("__total"))
    return filled.crossJoin(F.broadcast(total)).select(
        "bucket",
        F.log(
            (F.col("cnt") + 1).cast("double")
            / (F.col("__total") + n_buckets).cast("double")
        ).alias("logp"),
    )


def importance_weights(
    raw: DataFrame,
    target: DataFrame,
    n_buckets: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DSIR importance weights for every raw document:
    (id_col, n_features, llr, avg_llr, selected).

    ``llr`` = total log-likelihood ratio of the doc's hashed features
    (target over raw bucket models, ROUND 6); ``avg_llr`` = llr /
    n_features (ROUND 6); ``selected`` = avg_llr > 0. Both corpora are
    featurized with the same hash, so a doc present in both
    contributes to both models — the paper's setting (target is a
    small trusted corpus, raw is the crawl).
    """
    raw_feats = hashed_ngram_features(raw, n_buckets, id_col, text_col)
    tgt_feats = hashed_ngram_features(target, n_buckets, id_col, text_col)

    p_raw = bucket_distribution(raw_feats, n_buckets)
    p_tgt = bucket_distribution(tgt_feats, n_buckets)
    ratio = p_tgt.alias("t").join(p_raw.alias("r"), "bucket").select(
        "bucket", (F.col("t.logp") - F.col("r.logp")).alias("llr_b")
    )

    scored = raw_feats.join(F.broadcast(ratio), "bucket").groupBy(id_col).agg(
        F.sum("n").alias("n_features"),
        F.sum(F.col("n") * F.col("llr_b")).alias("__llr"),
    )
    return scored.select(
        id_col,
        "n_features",
        F.round("__llr", 6).alias("llr"),
        F.round(F.col("__llr") / F.col("n_features"), 6).alias("avg_llr"),
        (F.round(F.col("__llr") / F.col("n_features"), 6) > 0).alias("selected"),
    )
