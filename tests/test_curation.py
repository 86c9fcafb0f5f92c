"""Corpus-curation operator semantics: repetition metrics (values
hand-computed), benchmark decontamination (planted overlaps, short-doc
degradation, broadcast/shuffle parity), and stratified sampling
(determinism, md5-bucket model parity, rate monotonicity)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from cartography_spark.operators.curation import (
    decontaminate,
    repetition_features,
    sample_bucket,
    stratified_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "a a a b", "en"),
        (2, "v w x y z", "en"),
        (3, "p q p q p q p q", "zh"),
        (4, "solo", "de"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_repetition_values_hand_computed(docs):
    rows = {
        r["doc_id"]: r
        for r in repetition_features(docs, ngram=5).collect()
    }
    # doc 1: 4 tokens {a:3, b:1} -> top 3/4; distinct 2/4 -> dup 0.5;
    # single 5-gram window (shorter than n) -> dup_ngram 0.
    assert rows[1]["n_tokens"] == 4
    assert rows[1]["top_word_frac"] == 0.75
    assert rows[1]["dup_word_frac"] == 0.5
    assert rows[1]["dup_ngram_frac"] == 0.0
    assert rows[1]["repetitive"] is True
    # doc 2: all distinct -> nothing repeats.
    assert rows[2]["top_word_frac"] == 0.2
    assert rows[2]["dup_word_frac"] == 0.0
    assert rows[2]["repetitive"] is False
    # doc 3: 8 tokens of 2 words -> top 0.5; 4 shingle windows, 2
    # distinct ("p q p q p" / "q p q p q") -> dup_ngram 0.5.
    assert rows[3]["top_word_frac"] == 0.5
    assert rows[3]["dup_ngram_frac"] == 0.5
    assert rows[3]["repetitive"] is True
    # doc 4: one token; the fold must not divide by zero or inflate
    # the run via the "" accumulator seed.
    assert rows[4]["n_tokens"] == 1
    assert rows[4]["top_word_frac"] == 1.0
    assert rows[4]["repetitive"] is True  # top 1.0 > 0.2


def test_repetition_fold_matches_explode_groupby(spark):
    """The shuffle-free sorted-run fold equals the textbook
    explode+groupBy top-word share on a wider random-ish corpus."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    fold = {
        r["doc_id"]: r["top_word_frac"]
        for r in repetition_features(docs).select("doc_id", "top_word_frac").collect()
    }
    textbook = {
        r["doc_id"]: r["frac"]
        for r in (
            docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
            .groupBy("doc_id", "w").count()
            .groupBy("doc_id")
            .agg(F.round(F.max("count") / F.sum("count"), 4).alias("frac"))
            .collect()
        )
    }
    assert fold == textbook


def test_decontaminate_drops_planted_overlap(spark, docs):
    bench = spark.createDataFrame(
        [(100, "v w x y z overlaps here")], "doc_id long, text string"
    )
    kept = {r["doc_id"] for r in decontaminate(docs, bench, "doc_id", "text", ngram=5).collect()}
    # doc 2 shares the 5-gram "v w x y z"; others survive.
    assert kept == {1, 3, 4}


def test_decontaminate_short_doc_exact_match(spark, docs):
    # a benchmark doc shorter than n contributes its whole text as one
    # gram -> exact-text contamination still fires.
    bench = spark.createDataFrame([(100, "solo")], "doc_id long, text string")
    kept = {r["doc_id"] for r in decontaminate(docs, bench, "doc_id", "text", ngram=5).collect()}
    assert kept == {1, 2, 3}


def test_decontaminate_broadcast_and_shuffle_paths_agree(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bench = docs.where(F.col("doc_id") % 7 == 0)
    corpus = docs.where(F.col("doc_id") % 7 != 0)
    a = {r["doc_id"] for r in decontaminate(corpus, bench, "doc_id", "text", ngram=4).collect()}
    b = {
        r["doc_id"]
        for r in decontaminate(
            corpus, bench, "doc_id", "text", ngram=4, broadcast_benchmark=False
        ).collect()
    }
    assert a == b
    assert len(a) < corpus.count()  # the gate actually removes something


def test_sample_bucket_matches_python_md5_model(spark):
    rows = spark.range(200).select(
        F.col("id"), sample_bucket("id", denom=1000).alias("bucket")
    ).collect()
    for r in rows:
        expect = int(hashlib.md5(str(r["id"]).encode()).hexdigest()[:8], 16) % 1000
        assert r["bucket"] == expect


def test_stratified_sample_deterministic_and_stratified(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    kept1 = {r["doc_id"] for r in stratified_sample(docs, "lang", {"en": 0.5}, "doc_id").collect()}
    kept2 = {r["doc_id"] for r in stratified_sample(docs, "lang", {"en": 0.5}, "doc_id").collect()}
    assert kept1 == kept2  # no RNG state: identical membership across runs
    # non-en strata keep default_rate=1.0 exactly
    non_en = {r["doc_id"] for r in docs.where(F.col("lang") != "en").collect()}
    assert non_en <= kept1
    # the en stratum is actually downsampled
    n_en_total = docs.where(F.col("lang") == "en").count()
    n_en_kept = len(kept1) - len(non_en)
    assert 0 < n_en_kept < n_en_total


def test_repetition_plan_has_zero_exchange(spark):
    """The whole point of the run-fold formulation: every repetition
    signal is a per-row expression, so appending the operator adds NO
    Exchange to the scan (the textbook explode+groupBy would shuffle
    every token)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = repetition_features(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_decontaminate_joins_are_broadcast(spark):
    """Corpus-side shape: the gram semi-join and the id anti-join both
    carry the broadcast hint — the corpus itself is never shuffled."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bench = docs.where(F.col("doc_id") % 7 == 0)
    corpus = docs.where(F.col("doc_id") % 7 != 0)
    out = decontaminate(corpus, bench, "doc_id", "text", ngram=4)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    joins = [ln for ln in plan.splitlines() if "Join" in ln]
    assert len(joins) == 2
    assert all("strategy=broadcast" in ln for ln in joins)


def test_repetition_fold_matches_python_model_property(spark):
    """Property: the sorted-run fold's signals equal a pure-Python
    counter model on generated word lists (drawn from a small alphabet
    so repeats and runs actually occur), across partitioning."""
    from collections import Counter

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    words = st.lists(
        st.sampled_from(["a", "b", "ab", "ba", "x"]), min_size=1, max_size=12
    )

    def model(toks):
        n = len(toks)
        counts = Counter(toks)
        sh = [" ".join(toks[i : i + 5]) for i in range(max(n - 4, 1))]
        return (
            n,
            round(1.0 - len(set(toks)) / n, 4),
            round(1.0 - len(set(sh)) / len(sh), 4),
            round(max(counts.values()) / n, 4),
        )

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
    )
    @given(docs=st.lists(words, min_size=1, max_size=5))
    def run(docs):
        rows = [(i, " ".join(w)) for i, w in enumerate(docs)]
        df = spark.createDataFrame(rows, "doc_id int, text string").repartition(3)
        got = {
            r["doc_id"]: (
                r["n_tokens"], r["dup_word_frac"], r["dup_ngram_frac"], r["top_word_frac"]
            )
            for r in repetition_features(df).collect()
        }
        assert got == {i: model(w) for i, w in enumerate(docs)}

    run()


def test_decontaminate_sound_and_complete_property(spark):
    """Property: a doc is removed IFF it shares at least one word
    n-gram with some benchmark doc (Python set model) — no false
    removals (soundness) and no misses (completeness)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    words = st.lists(
        st.sampled_from(["p", "q", "r", "s"]), min_size=1, max_size=8
    )

    def grams(toks, n):
        return {" ".join(toks[i : i + n]) for i in range(max(len(toks) - n + 1, 1))}

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
    )
    @given(
        corpus=st.lists(words, min_size=1, max_size=5),
        bench=st.lists(words, min_size=1, max_size=3),
    )
    def run(corpus, bench):
        n = 3
        cdf = spark.createDataFrame(
            [(i, " ".join(w)) for i, w in enumerate(corpus)], "doc_id int, text string"
        )
        bdf = spark.createDataFrame(
            [(i, " ".join(w)) for i, w in enumerate(bench)], "doc_id int, text string"
        )
        kept = {r["doc_id"] for r in decontaminate(cdf, bdf, "doc_id", "text", ngram=n).collect()}
        bench_grams = set().union(*(grams(w, n) for w in bench))
        expect = {
            i for i, w in enumerate(corpus) if not (grams(w, n) & bench_grams)
        }
        assert kept == expect

    run()


def test_curation_funnel_counts_are_monotone(spark):
    """Each funnel stage can only lose documents, and every gate
    actually fires somewhere on the corpus (the funnel discriminates
    rather than passing everything through)."""
    from cartography_spark.queries.catalog import curation_funnel

    rows = curation_funnel(spark, "/root/testdata/sf0.01").collect()
    assert rows
    for r in rows:
        assert r["n_total"] >= r["n_clean"] >= r["n_decontaminated"] >= r["n_sampled"]
    assert sum(r["n_clean"] for r in rows) < sum(r["n_total"] for r in rows)
    assert sum(r["n_sampled"] for r in rows) < sum(r["n_decontaminated"] for r in rows)


def test_stratified_sample_rate_monotone_nesting(spark):
    """Lowering a stratum's rate only removes rows (hash-bucket samples
    nest: bucket < 250 implies bucket < 500) — the property that makes
    re-mixing cheap (a lower-rate sample is a subset, not a re-roll)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    half = {r["doc_id"] for r in stratified_sample(docs, "lang", {"en": 0.5}, "doc_id").collect()}
    quarter = {r["doc_id"] for r in stratified_sample(docs, "lang", {"en": 0.25}, "doc_id").collect()}
    assert quarter <= half


def test_split_assignment_disjoint_complete_and_model(spark):
    import hashlib

    from cartography_spark.operators.curation import split_assignment

    docs = spark.createDataFrame(
        [(i, "en") for i in range(400)], "doc_id long, lang string"
    )
    out = split_assignment(
        docs, {"train": 0.9, "valid": 0.05, "test": 0.05}
    ).collect()
    assert len(out) == 400  # complete: every row labeled exactly once
    got = {r["doc_id"]: r["split"] for r in out}

    def model(i):
        b = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 1_000_000
        if b < 900_000:
            return "train"
        if b < 950_000:
            return "valid"
        return "test"

    assert got == {i: model(i) for i in range(400)}
    # All three splits non-empty at n=400 with 5% tails (sanity).
    assert {"train", "valid", "test"} == set(got.values())


def test_split_assignment_validates_fractions(spark):
    import pytest as _pt

    from cartography_spark.operators.curation import split_assignment

    docs = spark.createDataFrame([(1, "en")], "doc_id long, lang string")
    with _pt.raises(ValueError, match="sum to 1"):
        split_assignment(docs, {"train": 0.5, "test": 0.2})
    with _pt.raises(ValueError, match="non-empty"):
        split_assignment(docs, {})


# ------------------------------------------------------- weighted sample

def _py_weighted_sample(rows, k, seed="ws"):
    """rows: (group, id, w). Same exponential race: key = -ln(u)/w."""
    import hashlib as _h
    import math as _m

    keyed = []
    for g, i, w in rows:
        h = int(_h.md5(f"{seed}{i}".encode()).hexdigest()[:8], 16)
        u = (h + 1) / 2**32
        keyed.append((g, i, -_m.log(u) / w))
    out = []
    for g in {r[0] for r in rows}:
        grp = sorted((k2, i) for gg, i, k2 in keyed if gg == g)
        out.extend((g, i, rank + 1) for rank, (_, i) in enumerate(grp[:k]))
    return sorted(out)


def test_weighted_sample_matches_python_model(spark):
    from cartography_spark.operators.curation import weighted_sample

    rows = [(f"g{i % 3}", i, 1 + (i * 7) % 13) for i in range(60)]
    df = spark.createDataFrame(rows, "grp string, id long, w long")
    got = sorted(
        (r["grp"], r["id"], r["sample_rank"])
        for r in weighted_sample(df, ["grp"], "w", "id", k=4).collect()
    )
    assert got == _py_weighted_sample(rows, 4)


def test_weighted_sample_small_groups_keep_all_rows(spark):
    from cartography_spark.operators.curation import weighted_sample

    df = spark.createDataFrame(
        [("a", 1, 5), ("a", 2, 5), ("b", 3, 5)], "grp string, id long, w long"
    )
    got = weighted_sample(df, ["grp"], "w", "id", k=10).collect()
    assert len(got) == 3
    assert {r["sample_rank"] for r in got} <= {1, 2}


def test_weighted_sample_biases_toward_heavy_weights(spark):
    from collections import Counter

    from cartography_spark.operators.curation import weighted_sample

    # 200 groups x {1 heavy (w=50), 9 light (w=1)}: the heavy row
    # should be sampled (k=1) in far more groups than any light one —
    # P(heavy wins) = 50/59 ≈ 0.85.
    rows = [
        (f"g{g}", g * 10 + i, 50 if i == 0 else 1)
        for g in range(200)
        for i in range(10)
    ]
    df = spark.createDataFrame(rows, "grp string, id long, w long")
    got = weighted_sample(df, ["grp"], "w", "id", k=1).collect()
    wins = Counter("heavy" if r["id"] % 10 == 0 else "light" for r in got)
    assert wins["heavy"] > 140  # E≈170, sigma≈5 — far above any noise
    # and determinism: a re-run is identical
    again = weighted_sample(df.repartition(11), ["grp"], "w", "id", k=1).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))


def test_weighted_sample_validates(spark):
    import pytest as _pt

    from cartography_spark.operators.curation import weighted_sample

    df = spark.createDataFrame([("a", 1, 0)], "grp string, id long, w long")
    with _pt.raises(ValueError, match="non-positive"):
        weighted_sample(df, ["grp"], "w", "id", k=1)
    df2 = spark.createDataFrame([("a", 1, 2)], "grp string, id long, w long")
    with _pt.raises(ValueError, match="k must be"):
        weighted_sample(df2, ["grp"], "w", "id", k=0)


# --------------------------------------------------------- mixture plan

def test_mixture_plan_hand_computed(spark):
    from cartography_spark.operators.curation import mixture_plan

    rows = (
        [("en", i, 10) for i in range(10)]      # 100 tokens available
        + [("de", i, 10) for i in range(3)]     # 30 tokens (scarce)
        + [("fr", i, 10) for i in range(5)]     # 50 tokens, untargeted
    )
    df = spark.createDataFrame(rows, "lang string, id long, w long")
    got = {
        r["stratum"]: r
        for r in mixture_plan(df, "lang", "w", {"en": 0.5, "de": 0.5}).collect()
    }
    # T = min(100/0.5, 30/0.5) = 60: de kept whole, en sampled at 30%.
    assert got["de"]["rate"] == pytest.approx(1.0)
    assert got["de"]["planned"] == pytest.approx(30.0)
    assert got["en"]["rate"] == pytest.approx(0.3)
    assert got["en"]["planned"] == pytest.approx(30.0)
    assert got["fr"]["rate"] == 0.0 and got["fr"]["planned"] == 0.0
    assert got["fr"]["n_rows"] == 5  # still reported


def test_mixture_plan_validates(spark):
    from cartography_spark.operators.curation import mixture_plan

    df = spark.createDataFrame([("en", 1)], "lang string, w long")
    with pytest.raises(ValueError, match="sum to 1"):
        mixture_plan(df, "lang", "w", {"en": 0.5})
    with pytest.raises(ValueError, match="> 0"):
        mixture_plan(df, "lang", "w", {"en": 1.5, "de": -0.5})
    with pytest.raises(ValueError, match="non-empty"):
        mixture_plan(df, "lang", "w", {})


def test_calibrate_scores_percentiles(spark):
    from cartography_spark.operators.curation import calibrate_scores

    rows = [("a", 1, 10), ("a", 2, 20), ("a", 3, 20), ("a", 4, 40), ("b", 5, 7)]
    df = spark.createDataFrame(rows, "g string, id long, s long")
    got = {r["id"]: r["pct_rank"] for r in calibrate_scores(df, ["g"], "s").collect()}
    assert got[1] == 0.0
    assert got[2] == got[3] == pytest.approx(1 / 3)   # tie shares the rank
    assert got[4] == 1.0
    assert got[5] == 0.0                              # singleton group
    desc = {
        r["id"]: r["pct_rank"]
        for r in calibrate_scores(df, ["g"], "s", ascending=False).collect()
    }
    assert desc[4] == 0.0 and desc[1] == 1.0


def test_mixture_plan_zero_available_targeted_stratum_is_loud_not_nan(spark):
    import math

    from cartography_spark.operators.curation import mixture_plan

    df = spark.createDataFrame(
        [("en", 1, 10), ("de", 2, 0)], "lang string, id long, w long"
    )
    got = {
        r["stratum"]: r
        for r in mixture_plan(df, "lang", "w", {"en": 0.5, "de": 0.5}).collect()
    }
    # de has rows but zero weight: T = 0, every rate 0 — never NaN.
    for r in got.values():
        assert not math.isnan(r["rate"]) and not math.isnan(r["planned"])
        assert r["rate"] == 0.0 and r["planned"] == 0.0


def test_domain_quality_shrinks_toward_global_mean(spark):
    from cartography_spark.operators.curation import domain_quality

    # big domain: 30 docs of identical mid text; small: 2 outliers.
    rows = [(i, "the cat sat on the mat with a hat", "big") for i in range(30)]
    rows += [(100, "a b c d e f g h i j k l m n o p q r s t", "small"),
             (101, "w x y z aa bb cc dd ee ff gg hh ii jj", "small")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r["source"]: r for r in domain_quality(df, k=20.0).collect()}
    assert got["big"]["n_docs"] == 30 and got["small"]["n_docs"] == 2
    # shrinkage: each domain's shrunk score sits between raw and global
    import numpy as np
    g = (30 * got["big"]["raw_mean"] + 2 * got["small"]["raw_mean"]) / 32
    for d in ("big", "small"):
        r = got[d]
        lo, hi = sorted((r["raw_mean"], g))
        assert lo - 1e-9 <= r["shrunk_score"] <= hi + 1e-9
    # the small domain moves proportionally much further toward global
    small_move = abs(got["small"]["shrunk_score"] - got["small"]["raw_mean"])
    big_move = abs(got["big"]["shrunk_score"] - got["big"]["raw_mean"])
    denom_small = abs(g - got["small"]["raw_mean"]) or 1.0
    denom_big = abs(g - got["big"]["raw_mean"]) or 1.0
    assert small_move / denom_small > big_move / denom_big


def test_domain_quality_exact_formula(spark):
    from cartography_spark.functions.textstats import quality_features
    from cartography_spark.operators.curation import domain_quality

    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "a"),
        (2, "pack my box with five dozen liquor jugs", "a"),
        (3, "how vexingly quick daft zebras jump", "b"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    scores = {
        r["doc_id"]: r["quality_score"]
        for r in quality_features(df).collect()
    }
    g = sum(scores.values()) / 3
    got = {r["source"]: r for r in domain_quality(df, k=2.0).collect()}
    raw_a = (scores[1] + scores[2]) / 2
    assert got["a"]["raw_mean"] == round(raw_a, 6)
    assert got["a"]["shrunk_score"] == round((2 * raw_a + 2 * g) / 4, 6)
    assert got["b"]["shrunk_score"] == round((scores[3] + 2 * g) / 3, 6)
