"""Embedding-corpus generation: python-model parity for the md5 walk
draws and negative picks, dangling-stop semantics, the
filtered-positive property, and partition-count invariance."""

from __future__ import annotations

import hashlib
import random

import pytest

from cartography_spark.operators.embedding import negative_samples, random_walks


def _pick(key: str, denom: int) -> int:
    return int(hashlib.md5(key.encode()).hexdigest()[:8], 16) % denom


def _py_walks(edges, walk_len, num_walks=1, seed="walk"):
    """Sequential model: dst-sorted adjacency, md5 step draws."""
    adj = {}
    for s, d in sorted(set(edges)):
        adj.setdefault(s, []).append(d)
    nodes = {v for e in edges for v in e}
    rows = []
    for v in sorted(nodes):
        for w in range(num_walks):
            walk = f"{v}#{w}"
            cur = v
            rows.append((walk, 0, cur))
            for t in range(1, walk_len + 1):
                nbrs = adj.get(cur)
                if not nbrs:
                    break
                cur = nbrs[_pick(f"{seed}{walk}:{t}", len(nbrs))]
                rows.append((walk, t, cur))
    return sorted(rows)


def test_random_walks_matches_python_model(spark):
    edges = [
        ("a", "b"), ("a", "c"), ("b", "a"), ("b", "c"),
        ("c", "a"), ("c", "d"),  # d is dangling: walks stop there
    ]
    edf = spark.createDataFrame(edges, "src string, dst string")
    got = sorted(
        (r["walk"], r["step"], r["id"])
        for r in random_walks(edf, walk_len=4, num_walks=2).collect()
    )
    assert got == _py_walks(edges, walk_len=4, num_walks=2)


def test_random_walks_dangling_start_emits_step0_only(spark):
    edf = spark.createDataFrame([("a", "b")], "src string, dst string")
    got = sorted(
        (r["walk"], r["step"], r["id"])
        for r in random_walks(edf, walk_len=3).collect()
    )
    # b has no out-edges: its walk is just the start row; a's walk
    # reaches b at step 1 and stops.
    assert got == [("a#0", 0, "a"), ("a#0", 1, "b"), ("b#0", 0, "b")]


def test_random_walks_partition_count_invariant(spark):
    rng = random.Random(3)
    nodes = [f"v{i}" for i in range(20)]
    edges = list({(rng.choice(nodes), rng.choice(nodes)) for _ in range(50)})
    edges = [(s, d) for s, d in edges if s != d]
    rows1 = spark.createDataFrame(edges, "src string, dst string").repartition(1)
    rows7 = spark.createDataFrame(edges, "src string, dst string").repartition(7)
    a = sorted(map(tuple, random_walks(rows1, walk_len=3).collect()))
    b = sorted(map(tuple, random_walks(rows7, walk_len=3).collect()))
    assert a == b == _py_walks(edges, walk_len=3)


def test_random_walks_validates_args(spark):
    edf = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError, match="walk_len"):
        random_walks(edf, walk_len=-1)
    with pytest.raises(ValueError, match="num_walks"):
        random_walks(edf, walk_len=1, num_walks=0)


def _py_negatives(triples, k=2, seed="neg"):
    ents = sorted({o for _, _, o in triples})
    true = set(triples)
    out = []
    for s, p, o in triples:
        for j in range(k):
            cand = ents[_pick(f"{seed}{s}|{p}|{o}|{j}", len(ents))]
            if (s, p, cand) not in true:
                out.append((s, p, cand, j))
    return sorted(out)


def test_negative_samples_matches_python_model(spark):
    triples = [
        ("d1", "mentions", "spark"),
        ("d1", "mentions", "join"),
        ("d2", "mentions", "spark"),
        ("d3", "mentions", "hash"),
        ("d3", "mentions", "scan"),
    ]
    tdf = spark.createDataFrame(triples, "subj string, pred string, obj string")
    got = sorted(
        (r["subj"], r["pred"], r["neg_obj"], r["j"])
        for r in negative_samples(tdf, k=3).collect()
    )
    assert got == _py_negatives(triples, k=3)


def test_negative_samples_never_emit_true_triples(spark):
    rng = random.Random(11)
    subs = [f"d{i}" for i in range(30)]
    objs = [f"e{i}" for i in range(10)]
    triples = list(
        {(rng.choice(subs), "mentions", rng.choice(objs)) for _ in range(80)}
    )
    tdf = spark.createDataFrame(triples, "subj string, pred string, obj string")
    got = negative_samples(tdf, k=2).collect()
    true = set(triples)
    assert got, "expected some surviving negatives"
    for r in got:
        assert (r["subj"], r["pred"], r["neg_obj"]) not in true
    assert sorted(
        (r["subj"], r["pred"], r["neg_obj"], r["j"]) for r in got
    ) == _py_negatives(triples, k=2)


def test_negative_samples_validates_k(spark):
    tdf = spark.createDataFrame(
        [("a", "p", "x")], "subj string, pred string, obj string"
    )
    with pytest.raises(ValueError, match="k must be"):
        negative_samples(tdf, k=0)


def test_embedding_plans_broadcast_and_stay_parallel(spark):
    """100 TB shape pins: the negative sampler's entity dictionary is a
    BROADCAST join (never a shuffled one) and the walk step join is an
    equi-join on the composite (node, index) key — no cartesian, and no
    single-partition exchange outside the dictionary's own dim-sized
    row_number (which is the documented dictionary build)."""
    edges = [(f"v{i}", f"v{(i * 7 + 1) % 40}") for i in range(40)]
    edf = spark.createDataFrame(edges, "src string, dst string")
    walk_plan = (
        random_walks(edf, walk_len=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in walk_plan
    assert "BroadcastNestedLoopJoin" not in walk_plan

    tdf = spark.createDataFrame(
        [(f"d{i}", "p", f"e{i % 9}") for i in range(60)],
        "subj string, pred string, obj string",
    )
    neg_plan = (
        negative_samples(tdf, k=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in neg_plan
    assert "CartesianProduct" not in neg_plan


def test_shortest_paths_and_lpa_plans_stay_parallel(spark):
    from cartography_spark.operators.graphrank import (
        label_propagation,
        shortest_paths,
    )

    edges = [(f"v{i}", f"v{(i * 3 + 1) % 30}") for i in range(30)]
    ndf = spark.createDataFrame(
        [(f"v{i}",) for i in range(30)], "id string"
    )
    edf = spark.createDataFrame(edges, "src string, dst string")
    seeds = spark.createDataFrame([("v0",)], "id string")
    sp_plan = (
        shortest_paths(ndf, edf, seeds, rounds=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # The LPA tie-break window partitions by node id, so even the pick
    # stays a parallel hash exchange.
    lpa_plan = (
        label_propagation(ndf, edf, iterations=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    for plan in (sp_plan, lpa_plan):
        assert "SinglePartition" not in plan
        assert "CartesianProduct" not in plan


def test_skipgram_pairs_hand_computed(spark):
    from cartography_spark.operators.embedding import skipgram_pairs

    walks = spark.createDataFrame(
        [("w1", 0, "a"), ("w1", 1, "b"), ("w1", 2, "c"), ("w1", 3, "d"),
         ("w2", 0, "x")],
        "walk string, step int, id string",
    )
    got = sorted(
        (r["center"], r["context"], r["offset"])
        for r in skipgram_pairs(walks, window=2).collect()
    )
    want = []
    seq = ["a", "b", "c", "d"]
    for i, c in enumerate(seq):
        for j, x in enumerate(seq):
            if i != j and abs(i - j) <= 2:
                want.append((c, x, j - i))
    assert got == sorted(want)
    # the singleton walk yields no pairs; window validation
    import pytest as _pt

    with _pt.raises(ValueError, match="window"):
        skipgram_pairs(walks, window=0)


def test_entity_contexts_hand_computed(spark):
    from cartography_spark.functions.triples import entity_contexts

    docs = spark.createDataFrame(
        [(1, "spark beats hand rolled join engines spark"),
         (2, "join")],
        "doc_id long, text string",
    )
    got = sorted(
        (r["id"], r["pos"], r["entity"], r["context"])
        for r in entity_contexts(docs, "doc_id", "text",
                                 ["spark", "join"], window=2).collect()
    )
    assert got == [
        # doc 1: spark@1 (left edge), join@5, spark@7 (right edge)
        (1, 1, "spark", "beats hand"),
        (1, 5, "join", "hand rolled engines spark"),
        (1, 7, "spark", "join engines"),
        # doc 2: single-token doc -> empty context, still emitted
        (2, 1, "join", ""),
    ]


def test_entity_contexts_counts_match_extract_mentions(spark):
    from pyspark.sql import functions as F

    from cartography_spark.functions.triples import entity_contexts, extract_mentions

    docs = spark.createDataFrame(
        [(i, " ".join(["spark", f"w{i}", "join", "spark"][: (i % 4) + 1]))
         for i in range(20)],
        "doc_id long, text string",
    )
    vocab = ["spark", "join"]
    per_occurrence = (
        entity_contexts(docs, "doc_id", "text", vocab)
        .groupBy(F.col("id").alias("subj_id"), F.col("entity").alias("obj"))
        .agg(F.count("*").alias("n_mentions"))
    )
    mentions = extract_mentions(docs, "doc_id", "text", vocab).select(
        "subj_id", "obj", "n_mentions"
    )
    assert per_occurrence.exceptAll(mentions).count() == 0
    assert mentions.exceptAll(per_occurrence).count() == 0


def _py_node2vec(edges, walk_len, p=2.0, q=0.5, num_walks=1, seed="n2v"):
    adj = {}
    eset = set(edges)
    for s, d in sorted(set(edges)):
        adj.setdefault(s, []).append(d)
    nodes = sorted({v for e in edges for v in e})
    rows = []
    for v in nodes:
        for w in range(num_walks):
            walk = f"{v}#{w}"
            prev, cur = None, v
            rows.append((walk, 0, cur))
            for t in range(1, walk_len + 1):
                nbrs = adj.get(cur)
                if not nbrs:
                    break
                if prev is None:
                    alphas = [1.0] * len(nbrs)
                else:
                    alphas = [
                        (1.0 / p) if x == prev
                        else 1.0 if (prev, x) in eset
                        else (1.0 / q)
                        for x in nbrs
                    ]
                h = int(hashlib.md5(f"{seed}{walk}:{t}".encode()).hexdigest()[:8], 16)
                u = (h + 1) / 2**32
                target = u * sum(alphas)
                cum, pick = 0.0, None
                for x, a in zip(nbrs, alphas):
                    cum += a
                    if cum > target:
                        pick = x
                        break
                prev, cur = cur, pick
                rows.append((walk, t, cur))
    return sorted(rows)


def test_node2vec_matches_python_model(spark):
    from cartography_spark.operators.embedding import node2vec_walks

    rng = random.Random(9)
    nodes = [f"v{i}" for i in range(15)]
    edges = list({(rng.choice(nodes), rng.choice(nodes)) for _ in range(45)})
    edges = [(s, d) for s, d in edges if s != d]
    # symmetrize so returns are possible (the 1/p branch gets hit)
    edges = list({*edges, *[(d, s) for s, d in edges]})
    edf = spark.createDataFrame(edges, "src string, dst string")
    got = sorted(
        map(tuple, node2vec_walks(edf, walk_len=4, p=2.0, q=0.5).collect())
    )
    assert got == _py_node2vec(edges, walk_len=4, p=2.0, q=0.5)
    # partition invariance
    again = sorted(
        map(tuple, node2vec_walks(edf.repartition(7), walk_len=4).collect())
    )
    assert again == got


def test_node2vec_p_controls_return_rate(spark):
    from cartography_spark.operators.embedding import node2vec_walks

    # Star graph with center c: from a leaf the ONLY neighbor is c, so
    # step pairs leaf->c->? test the return branch: with p tiny
    # (return weight 1/p huge) the walk bounces c->leaf->c...; with p
    # huge it should usually move to a DIFFERENT leaf.
    edges = [("c", f"l{i}") for i in range(12)] + [(f"l{i}", "c") for i in range(12)]
    edf = spark.createDataFrame(edges, "src string, dst string")

    def return_rate(p):
        rows = node2vec_walks(edf, walk_len=2, p=p, q=1.0).collect()
        by_walk = {}
        for r in rows:
            by_walk.setdefault(r["walk"], {})[r["step"]] = r["id"]
        # walks starting at a leaf: step1 = c, step2 = ? (return = same leaf)
        rets = tot = 0
        for w, steps in by_walk.items():
            if w.startswith("l") and 2 in steps:
                tot += 1
                rets += steps[2] == w.split("#")[0]
        return rets, tot

    r_low, t_low = return_rate(1.0 / 1024)  # 1/p = 1024 vs 11 others
    r_high, t_high = return_rate(64.0)     # 1/p = 1/64
    assert t_low == t_high == 12
    assert r_low >= 10          # return mass 1024/1035 per walk
    assert r_high <= 2          # return mass ~1/(64*11)


def test_node2vec_validates(spark):
    from cartography_spark.operators.embedding import node2vec_walks

    edf = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError, match="p and q"):
        node2vec_walks(edf, walk_len=1, p=0.0)
    with pytest.raises(ValueError, match="walk_len"):
        node2vec_walks(edf, walk_len=-2)
