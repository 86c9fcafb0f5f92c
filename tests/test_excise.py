"""Repeated n-gram span excision (operators/dedup.py)."""

from __future__ import annotations

from cartography_spark.operators.dedup import excise_repeated_ngrams


def _run(spark, docs, n=3, min_docs=2):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = excise_repeated_ngrams(df, "doc_id", "text", n=n, min_docs=min_docs).collect()
    return {r["id"]: (r["n_tokens"], r["n_removed"], r["clean_text"]) for r in rows}


def test_excises_shared_span_keeps_unique_text(spark):
    # "x y z" repeats across both docs (3-gram, min_docs=2): covered
    # tokens go, the unique prefix/suffix tokens stay, order preserved.
    got = _run(
        spark,
        [(1, "aa bb x y z cc"), (2, "dd x y z ee ff")],
    )
    assert got[1] == (6, 3, "aa bb cc")
    assert got[2] == (6, 3, "dd ee ff")


def test_overlapping_occurrences_cover_union_not_sum(spark):
    # "x y z w" contains two overlapping repeated 3-grams ("x y z",
    # "y z w") in doc 1 — coverage is the union (4 tokens), not 6.
    got = _run(
        spark,
        [(1, "x y z w"), (2, "q x y z q2"), (3, "r y z w r2")],
    )
    assert got[1] == (4, 4, "")
    assert got[2] == (5, 3, "q q2")
    assert got[3] == (5, 3, "r r2")


def test_within_doc_repeat_alone_not_excised(spark):
    # The same 3-gram twice in ONE doc doesn't qualify (min_docs=2
    # counts DISTINCT docs) — nothing is removed anywhere.
    got = _run(
        spark,
        [(1, "x y z k x y z"), (2, "totally different words here")],
    )
    assert got[1] == (7, 0, "x y z k x y z")
    assert got[2][1] == 0


def test_short_docs_pass_through(spark):
    got = _run(spark, [(1, "a b"), (2, "a b")])
    assert got[1] == (2, 0, "a b")
    assert got[2] == (2, 0, "a b")


def test_partition_invariant(spark):
    docs = [(i, f"u{i} common span words tail{i % 3}") for i in range(20)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    a = sorted(
        map(tuple, excise_repeated_ngrams(df, "doc_id", "text", n=3).collect())
    )
    b = sorted(
        map(
            tuple,
            excise_repeated_ngrams(df.repartition(7), "doc_id", "text", n=3).collect(),
        )
    )
    assert a == b
    # The shared middle span is actually excised.
    assert all(r[2] > 0 for r in a)
