"""Sequence packing / distributed prefix sum: Python-model parity,
partition-count invariance, stream contiguity, boundary cases."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from cartography_spark.operators.packing import global_prefix_sum, pack_documents


def _docs(spark, sizes):
    rows = [(i, " ".join(["w"] * n)) for i, n in enumerate(sizes)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pack_hand_computed(spark):
    # sizes 4, 3, 5 with capacity 6:
    #   doc0 start 0  -> bin 0, off 0, spans 1
    #   doc1 start 4  -> bin 0, off 4, spans [4..6] -> 2 bins
    #   doc2 start 7  -> bin 1, off 1, spans 1
    out = {
        r["doc_id"]: r
        for r in pack_documents(_docs(spark, [4, 3, 5]), capacity=6).collect()
    }
    assert (out[0]["start_offset"], out[0]["bin"], out[0]["bin_offset"]) == (0, 0, 0)
    assert out[0]["n_bins_spanned"] == 1
    assert (out[1]["start_offset"], out[1]["bin"], out[1]["bin_offset"]) == (4, 0, 4)
    assert out[1]["n_bins_spanned"] == 2
    assert (out[2]["start_offset"], out[2]["bin"], out[2]["bin_offset"]) == (7, 1, 1)
    assert out[2]["n_bins_spanned"] == 1


def test_pack_matches_python_scan(spark):
    rng = random.Random(11)
    sizes = [rng.randrange(1, 40) for _ in range(300)]
    cap = 17
    got = {
        r["doc_id"]: r
        for r in pack_documents(_docs(spark, sizes), capacity=cap, partitions=8).collect()
    }
    start = 0
    for i, n in enumerate(sizes):
        r = got[i]
        assert r["n_tokens"] == n
        assert r["start_offset"] == start
        assert r["bin"] == start // cap
        assert r["bin_offset"] == start % cap
        assert r["n_bins_spanned"] == (start + n - 1) // cap - start // cap + 1
        start += n
    # Contiguity: the stream has no holes, so offsets are a permutation
    # of the exclusive prefix sums — implied by the loop above.


def test_pack_partition_count_invariant(spark):
    rng = random.Random(23)
    sizes = [rng.randrange(1, 30) for _ in range(500)]
    docs = _docs(spark, sizes)
    a = pack_documents(docs.repartition(1), capacity=64, partitions=1)
    b = pack_documents(docs.repartition(16), capacity=64, partitions=16)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_pack_more_partitions_than_rows(spark):
    out = pack_documents(_docs(spark, [2, 3]), capacity=4, partitions=32).collect()
    got = {r["doc_id"]: r["start_offset"] for r in out}
    assert got == {0: 0, 1: 2}


def test_pack_explicit_size_col_and_zero(spark):
    df = spark.createDataFrame(
        [(1, 5), (2, 0), (3, 3)], "doc_id long, n long"
    )
    out = {
        r["doc_id"]: r
        for r in pack_documents(df, capacity=4, size_col="n").collect()
    }
    assert out[2]["n_tokens"] == 0
    assert out[2]["start_offset"] == 5
    assert out[2]["n_bins_spanned"] == 0
    assert out[3]["start_offset"] == 5  # zero-size doc consumes no stream


def test_pack_rejects_bad_capacity(spark):
    with pytest.raises(ValueError):
        pack_documents(_docs(spark, [1]), capacity=0)


def test_shard_assignment_deterministic_and_complete(spark):
    import hashlib

    from cartography_spark.operators.packing import shard_assignment

    docs = _docs(spark, [3] * 200).select("doc_id")
    out = shard_assignment(docs, n_shards=4, salt="s1").collect()
    assert len(out) == 200  # nothing dropped or duplicated
    got = {r["doc_id"]: (r["shard"], r["position"]) for r in out}

    # Re-derive with hashlib: shard = first-8-hex int % 4, position =
    # rank of (digest, id) within the shard.
    digests = {
        i: hashlib.md5(f"s1{i}".encode()).hexdigest() for i in range(200)
    }
    by_shard: dict[int, list] = {}
    for i, d in digests.items():
        by_shard.setdefault(int(d[:8], 16) % 4, []).append((d, i))
    for shard, members in by_shard.items():
        for pos, (_, i) in enumerate(sorted(members)):
            assert got[i] == (shard, pos), f"doc {i}"


def test_shard_assignment_salt_reshuffles(spark):
    from cartography_spark.operators.packing import shard_assignment

    docs = _docs(spark, [1] * 100).select("doc_id")
    a = {r["doc_id"]: (r["shard"], r["position"])
         for r in shard_assignment(docs, 8, salt="e0").collect()}
    b = {r["doc_id"]: (r["shard"], r["position"])
         for r in shard_assignment(docs, 8, salt="e1").collect()}
    assert a != b  # epochs differ...
    a2 = {r["doc_id"]: (r["shard"], r["position"])
          for r in shard_assignment(docs.repartition(16), 8, salt="e0").collect()}
    assert a == a2  # ...but each epoch is partition-count invariant


def test_build_postings_model(spark):
    from cartography_spark.operators.index import build_postings

    docs = spark.createDataFrame(
        [
            (3, "b a"),
            (1, "a a c"),
            (2, "a b"),
        ],
        "doc_id long, text string",
    )
    out = {r["term"]: (r["df"], r["postings"])
           for r in build_postings(docs, max_postings=2).collect()}
    assert out["a"] == (3, [1, 2])   # df is FULL, postings capped at 2
    assert out["b"] == (2, [2, 3])
    assert out["c"] == (1, [1])


def test_bm25_matches_python_model(spark):
    import math

    from cartography_spark.operators.index import bm25_scores

    corpus = {
        1: "spark join spark scan",
        2: "merge sort agg",
        3: "hash hash hash spark",
        4: "filter filter",
    }
    docs = spark.createDataFrame(list(corpus.items()), "doc_id long, text string")
    q = ["spark", "hash", "merge"]
    k1, b = 1.2, 0.75
    n = len(corpus)
    lens = {i: len(t.split(" ")) for i, t in corpus.items()}
    avgdl = sum(lens.values()) / n
    df = {t: sum(1 for txt in corpus.values() if t in txt.split(" ")) for t in q}

    def bm25(i):
        s = 0.0
        for t in q:
            tf = corpus[i].split(" ").count(t)
            if tf == 0:
                continue
            idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            s += idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * lens[i] / avgdl))
        return s

    got = {r["doc_id"]: r["score"] for r in bm25_scores(docs, q).collect()}
    assert set(got) == {1, 2, 3}  # doc 4 has no query term
    for i in (1, 2, 3):
        assert got[i] == pytest.approx(bm25(i), abs=1e-12)
    # tf saturation: doc 3's triple 'hash' must not score 3x a single hit.
    idf_hash = math.log((n - 1 + 0.5) / (1 + 0.5) + 1.0)
    assert got[3] < 3 * idf_hash


def test_bm25_rejects_empty_query(spark):
    import pytest as _pt

    from cartography_spark.operators.index import bm25_scores

    with _pt.raises(ValueError):
        bm25_scores(_docs(spark, [1]), [])


def test_build_postings_rejects_bad_cap(spark):
    import pytest as _pt

    from cartography_spark.operators.index import build_postings

    with _pt.raises(ValueError):
        build_postings(_docs(spark, [1]), max_postings=0)


def test_prefix_sum_never_plans_a_single_partition_exchange(spark):
    # THE scale property of the distributed scan: a naive global
    # Window.orderBy plans `Exchange SinglePartition` — every row
    # through one task. The two-pass scan must never do that.
    docs = _docs(spark, [3] * 100)
    out = pack_documents(docs, capacity=64, partitions=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    # Control: the naive spelling DOES plan it (guards the assertion
    # itself against Spark ever renaming the node).
    from pyspark.sql.window import Window

    naive = docs.withColumn(
        "o", F.sum(F.length("text")).over(Window.orderBy("doc_id"))
    )
    assert "SinglePartition" in naive._jdf.queryExecution().executedPlan().toString()


def test_shard_and_postings_plans_stay_parallel(spark):
    from cartography_spark.operators.index import build_postings
    from cartography_spark.operators.packing import shard_assignment

    docs = _docs(spark, [3] * 100)
    for frame in (
        shard_assignment(docs.select("doc_id"), n_shards=8),
        build_postings(docs, max_postings=4),
    ):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "SinglePartition" not in plan
        assert "CartesianProduct" not in plan


def test_global_prefix_sum_passthrough_and_order(spark):
    df = spark.createDataFrame(
        [("c", 10, "x"), ("a", 1, "y"), ("b", 5, "z")],
        "k string, v long, extra string",
    )
    out = {r["k"]: r for r in global_prefix_sum(df, "k", "v", partitions=2).collect()}
    assert out["a"]["prefix_sum"] == 0
    assert out["b"]["prefix_sum"] == 1
    assert out["c"]["prefix_sum"] == 6
    assert out["c"]["extra"] == "x"  # other columns pass through


def test_cooccurrence_pmi_hand_computed(spark):
    import math

    from cartography_spark.operators.index import cooccurrence_pmi

    # 4 docs: (a,b) together twice, a alone once, b alone once, (a,c) once.
    rows = [
        (1, "a"), (1, "b"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "c"),
        (4, "b"),
        (3, "a"),  # duplicate incidence must not double-count
    ]
    df = spark.createDataFrame(rows, "doc long, term string")
    got = {
        (r["term_a"], r["term_b"]): r
        for r in cooccurrence_pmi(df, "doc", "term").collect()
    }
    n, n_a, n_b, n_c = 4, 3, 3, 1
    ab = got[("a", "b")]
    assert ab["n_pair"] == 2
    assert ab["pmi"] == pytest.approx(math.log(2 * n / (n_a * n_b)), rel=1e-12)
    assert ab["npmi"] == pytest.approx(
        math.log(2 * n / (n_a * n_b)) / math.log(n / 2), rel=1e-12
    )
    ac = got[("a", "c")]
    assert ac["n_pair"] == 1
    # c appears only with a: pmi = ln(1*4/(3*1)) , npmi = pmi/ln(4)
    assert ac["pmi"] == pytest.approx(math.log(4 / 3), rel=1e-12)
    # no (b, c) pair ever co-occurs
    assert ("b", "c") not in got


def test_cooccurrence_pmi_always_together_npmi_is_one(spark):
    from cartography_spark.operators.index import cooccurrence_pmi

    rows = [(1, "x"), (1, "y"), (2, "x"), (2, "y")]
    df = spark.createDataFrame(rows, "doc long, term string")
    got = cooccurrence_pmi(df, "doc", "term").collect()
    assert len(got) == 1
    assert got[0]["npmi"] == 1.0
