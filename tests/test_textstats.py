"""Text-analysis function semantics (token counting, quality features,
langid, fingerprinting) on small fixtures."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cartography_spark.functions.textstats import (
    bpe_ish_token_count,
    doc_fingerprint,
    kmin_fingerprints,
    langid,
    quality_features,
    token_count,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox is happy to run in the field"),
        (2, "der hund ist nicht mit der katze und das ist gut"),
        (3, "el perro es un animal con la casa por que si"),
        (4, "x y z"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_token_count(docs):
    got = {r["doc_id"]: r["n"] for r in docs.select("doc_id", token_count("text").alias("n")).collect()}
    assert got == {1: 11, 2: 11, 3: 11, 4: 3}


def test_bpe_ish_token_count(spark):
    df = spark.createDataFrame([(1, "hello world, extraordinary!")], "i long, text string")
    n = df.select(bpe_ish_token_count("text").alias("n")).collect()[0]["n"]
    # hello->2, world,->2(6 chars/4 ceil)+... words split on whitespace:
    # "hello"(2) + "world,"(2) + "extraordinary!"(4) + 2 punct = 10
    assert n == 10


def test_quality_features(docs):
    out = quality_features(docs).collect()
    by_id = {r["doc_id"]: r for r in out}
    r1 = by_id[1]
    assert r1["n_tokens"] == 11
    assert r1["n_chars_calc"] == len("the quick brown fox is happy to run in the field")
    assert 0 < r1["stopword_ratio"] <= 1
    assert r1["punct_ratio"] == 0.0
    assert 0 <= r1["quality_score"] <= 1
    # short doc scores lower than stopword-rich doc
    assert by_id[4]["quality_score"] < r1["quality_score"]


def test_langid(docs):
    out = {r["doc_id"]: r["lang_pred"] for r in langid(docs).collect()}
    assert out[1] == "en"
    assert out[2] == "de"
    assert out[3] == "es"


def test_doc_fingerprint_collides_on_shared_window(spark):
    # Two docs sharing a 5-word window may collide only via that window;
    # identical docs always collide.
    df = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "a b c d e f g"), (3, "h i j k l m n")],
        "doc_id long, text string",
    )
    fps = {r["doc_id"]: r["fp"] for r in df.select("doc_id", doc_fingerprint("text").alias("fp")).collect()}
    assert fps[1] == fps[2]
    assert fps[1] != fps[3]


def test_kmin_fingerprints_shape(docs):
    rows = docs.select(kmin_fingerprints("text", k=4).alias("fp")).collect()
    for r in rows:
        assert len(r["fp"]) <= 4
        assert r["fp"] == sorted(r["fp"])


def test_redact_pii_known_strings(spark):
    """Byte-level redaction semantics on hand-checked fixtures,
    including the ordering contract (email before URL: a URL with
    userinfo loses its address part to the email pass first)."""
    from cartography_spark.functions.textstats import pii_counts, redact_pii

    rows = [
        (1, "mail a.b+c@site.org now"),
        (2, "go to https://x.example/path?q=1 today"),
        (3, "ping 192.168.0.1 and 10.0.0.255."),
        (4, "none here"),
        (5, "mixed bob@ex.io at https://h.io/u 127.0.0.1 end"),
    ]
    df = spark.createDataFrame(rows, "i long, t string")
    out = df.select(
        "i", *pii_counts("t"), redact_pii("t").alias("r")
    )
    got = {r["i"]: (r["n_email"], r["n_url"], r["n_ipv4"], r["r"]) for r in out.collect()}
    assert got[1] == (1, 0, 0, "mail <PII> now")
    assert got[2] == (0, 1, 0, "go to <PII> today")
    assert got[3] == (0, 0, 2, "ping <PII> and <PII>.")
    assert got[4] == (0, 0, 0, "none here")
    assert got[5] == (1, 1, 1, "mixed <PII> at <PII> <PII> end")

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan        # pure row-local scrub


def test_redact_pii_counts_do_not_double_count_url_userinfo(spark):
    """user@host inside a URL: the email pass claims it first, so the
    remaining URL fragment is still redacted but counted consistently
    with what the scrub actually saw."""
    from cartography_spark.functions.textstats import pii_counts, redact_pii

    df = spark.createDataFrame([(1, "see https://u.name@host.example/p x")], "i long, t string")
    r = df.select(*pii_counts("t"), redact_pii("t").alias("r")).collect()[0]
    # email pattern eats 'u.name@host.example'; no full URL remains intact
    assert r["n_email"] == 1
    assert "<PII>" in r["r"] and "host.example" not in r["r"]


def test_from_json_null_contract_for_props_extraction(spark):
    """events_json_props relies on typed from_json returning NULL for
    malformed JSON, missing keys, and NULL input — pin all three."""
    df = spark.createDataFrame(
        [('{"k": 5}',), ("not json",), ('{"x": 1}',), (None,)], "props string"
    )
    from pyspark.sql import functions as F

    got = [r[0] for r in df.select(F.from_json("props", "k BIGINT")["k"]).collect()]
    assert got == [5, None, None, None]


# --------------------------------------------------------- unigram LM

def _py_unigram_lm(train_texts, score_rows, alpha=1.0):
    import math as _m

    counts = {}
    for t in train_texts:
        for tok in t.split(" "):
            counts[tok] = counts.get(tok, 0) + 1
    n = sum(counts.values())
    v = len(counts) + 1
    denom = n + alpha * v
    out = {}
    for i, t in score_rows:
        lps = [_m.log((counts.get(tok, 0) + alpha) / denom) for tok in t.split(" ")]
        avg = sum(lps) / len(lps)
        out[i] = (len(lps), avg, _m.exp(-avg))
    return out


def test_unigram_lm_matches_python_model(spark):
    from cartography_spark.functions.textstats import unigram_lm_scores

    rows = [(1, "the cat sat"), (2, "the dog sat sat"), (3, "a cat")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["avg_logprob"], r["ppl"])
        for r in unigram_lm_scores(df, "doc_id", "text").collect()
    }
    want = _py_unigram_lm([t for _, t in rows], rows)
    assert set(got) == set(want)
    for i in want:
        assert got[i][0] == want[i][0]
        assert got[i][1] == pytest.approx(want[i][1], rel=1e-12)
        assert got[i][2] == pytest.approx(want[i][2], rel=1e-12)


def test_unigram_lm_cross_scoring_handles_oov(spark):
    from cartography_spark.functions.textstats import unigram_lm_scores

    train = spark.createDataFrame([(1, "the the the cat")], "doc_id long, text string")
    score = spark.createDataFrame([(9, "the zebra")], "doc_id long, text string")
    got = unigram_lm_scores(score, "doc_id", "text", lm_docs=train).collect()[0]
    want = _py_unigram_lm(["the the the cat"], [(9, "the zebra")])
    assert got["avg_logprob"] == pytest.approx(want[9][1], rel=1e-12)
    # and the fluent-vs-garbage ordering is right: "the the" beats it.
    fluent = spark.createDataFrame([(8, "the the")], "doc_id long, text string")
    g2 = unigram_lm_scores(fluent, "doc_id", "text", lm_docs=train).collect()[0]
    assert g2["ppl"] < got["ppl"]
