"""DSIR importance resampling (operators/dsir.py). Model = hashlib
md5-bucketed unigram+bigram features with Laplace-smoothed bucket
models in pure Python; parity on hand and pseudo-random corpora,
selection-sign pins, and partition invariance.
"""

from __future__ import annotations

import hashlib
import math

from cartography_spark.operators.dsir import (
    bucket_distribution,
    hashed_ngram_features,
    importance_weights,
)


def model_features(text, n_buckets):
    toks = [t for t in text.lower().split(" ") if t]
    grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    out = {}
    for g in grams:
        b = int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % n_buckets
        out[b] = out.get(b, 0) + 1
    return out


def model_weights(raw_docs, target_docs, n_buckets):
    """raw_docs/target_docs: {doc_id: text}. Returns
    {doc_id: (n_features, llr, avg_llr, selected)}."""

    def dist(docs):
        counts = {}
        for t in docs.values():
            for b, n in model_features(t, n_buckets).items():
                counts[b] = counts.get(b, 0) + n
        total = sum(counts.values())
        return {
            b: math.log((counts.get(b, 0) + 1) / (total + n_buckets))
            for b in range(n_buckets)
        }

    p_raw, p_tgt = dist(raw_docs), dist(target_docs)
    out = {}
    for did, text in raw_docs.items():
        feats = model_features(text, n_buckets)
        nf = sum(feats.values())
        llr = sum(n * (p_tgt[b] - p_raw[b]) for b, n in feats.items())
        avg = round(llr / nf, 6)
        out[did] = (nf, round(llr, 6), avg, avg > 0)
    return out


def _df(spark, docs, partitions=None):
    frame = spark.createDataFrame(
        [(k, v) for k, v in docs.items()], "doc_id long, text string"
    )
    return frame.repartition(partitions) if partitions else frame


def _run(spark, raw, target, n_buckets=64, partitions=None):
    rows = importance_weights(
        _df(spark, raw, partitions), _df(spark, target, partitions), n_buckets
    ).collect()
    return {
        r["doc_id"]: (r["n_features"], r["llr"], r["avg_llr"], r["selected"])
        for r in rows
    }


def test_features_count_unigrams_and_bigrams(spark):
    df = _df(spark, {1: "a b  a"})  # double space: empty token dropped
    rows = hashed_ngram_features(df, n_buckets=128).collect()
    got = {r["bucket"]: r["n"] for r in rows}
    assert got == model_features("a b  a", 128)
    # 3 unigrams + 2 bigrams ('a b', 'b a' — never 'b ' or ' a')
    assert sum(got.values()) == 5


def test_target_like_docs_score_positive(spark):
    raw = {i: "noise junk filler spam" for i in range(8)}
    raw.update({100 + i: "clean science prose text" for i in range(2)})
    target = {i: "clean science prose text" for i in range(5)}
    got = _run(spark, raw, target)
    assert all(got[100 + i][3] for i in range(2))
    assert not any(got[i][3] for i in range(8))
    assert got == model_weights(raw, target, 64)


def test_distribution_covers_all_buckets(spark):
    feats = hashed_ngram_features(_df(spark, {1: "x"}), n_buckets=16)
    rows = bucket_distribution(feats, 16).collect()
    assert len(rows) == 16
    # smoothing floor everywhere except x's bucket
    assert len({round(r["logp"], 9) for r in rows}) == 2


def _pseudo_docs(n, tag):
    docs = {}
    for i in range(n):
        h = hashlib.md5(f"{tag}{i}".encode()).hexdigest()
        docs[i if tag == "r" else 1000 + i] = " ".join(
            h[j : j + 3] for j in range(0, 18, 3)
        )
    return docs


def test_model_parity_on_pseudo_random_corpora(spark):
    raw, target = _pseudo_docs(40, "r"), _pseudo_docs(15, "t")
    assert _run(spark, raw, target, n_buckets=32) == model_weights(
        raw, target, 32
    )


def test_partition_invariance(spark):
    raw, target = _pseudo_docs(30, "r"), _pseudo_docs(10, "t")
    assert _run(spark, raw, target, partitions=1) == _run(
        spark, raw, target, partitions=9
    )
