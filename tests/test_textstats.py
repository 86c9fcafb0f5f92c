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
