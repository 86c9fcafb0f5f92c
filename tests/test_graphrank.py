"""PageRank + triangle counting: model parity against pure-Python
power iteration / brute-force enumeration, mass conservation, and
partition-count determinism."""

from __future__ import annotations

import itertools
import random

import pytest
from pyspark.sql import functions as F

from cartography_spark.operators.graphrank import pagerank, triangle_count


def _py_pagerank(nodes, edges, damping=0.85, iterations=5):
    """Sequential reference: same update rule, dict arithmetic."""
    n = len(nodes)
    out = {}
    for s, d in edges:
        out.setdefault(s, []).append(d)
    ranks = {v: 1.0 / n for v in nodes}
    for _ in range(iterations):
        contrib = {v: 0.0 for v in nodes}
        for s, targets in out.items():
            share = ranks[s] / len(targets)
            for t in targets:
                contrib[t] += share
        dang = sum(r for v, r in ranks.items() if v not in out)
        base = (1.0 - damping) / n
        ranks = {
            v: base + damping * (contrib[v] + dang / n) for v in nodes
        }
    return ranks


def _df_nodes_edges(spark, nodes, edges):
    ndf = spark.createDataFrame([(v,) for v in nodes], "id string")
    edf = spark.createDataFrame(list(edges), "src string, dst string")
    return ndf, edf


def test_pagerank_matches_python_model(spark):
    nodes = ["a", "b", "c", "d", "e"]
    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "c")]
    # e is isolated (dangling, no in-edges); d is dangling-free source.
    ndf, edf = _df_nodes_edges(spark, nodes, edges)
    got = {r["id"]: r["pagerank"] for r in pagerank(ndf, edf).collect()}
    want = _py_pagerank(nodes, edges)
    assert set(got) == set(want)
    for v in nodes:
        assert got[v] == pytest.approx(want[v], abs=1e-12)


def _py_pagerank_weighted(nodes, wedges, damping=0.85, iterations=5):
    n = len(nodes)
    out = {}
    for s, d, w in wedges:
        out.setdefault(s, []).append((d, w))
    ranks = {v: 1.0 / n for v in nodes}
    for _ in range(iterations):
        contrib = {v: 0.0 for v in nodes}
        for s, targets in out.items():
            total_w = sum(w for _, w in targets)
            for t, w in targets:
                contrib[t] += ranks[s] * w / total_w
        dang = sum(r for v, r in ranks.items() if v not in out)
        base = (1.0 - damping) / n
        ranks = {v: base + damping * (contrib[v] + dang / n) for v in nodes}
    return ranks


def test_pagerank_weighted_matches_python_model(spark):
    nodes = ["a", "b", "c", "d"]
    wedges = [("a", "b", 3.0), ("a", "c", 1.0), ("b", "c", 2.0), ("c", "a", 5.0)]
    ndf = spark.createDataFrame([(v,) for v in nodes], "id string")
    edf = spark.createDataFrame(wedges, "src string, dst string, weight double")
    got = {
        r["id"]: r["pagerank"]
        for r in pagerank(ndf, edf, weight_col="weight").collect()
    }
    want = _py_pagerank_weighted(nodes, wedges)
    for v in nodes:
        assert got[v] == pytest.approx(want[v], abs=1e-12)
    # b gets 3x a's mass share vs c's 1x — must outrank c's direct feed.
    assert got["b"] > 1.0 / len(nodes) * 0.85 * 0.5


def test_pagerank_unit_weights_equal_unweighted(spark):
    nodes = ["a", "b", "c", "d", "e"]
    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "c")]
    ndf, edf = _df_nodes_edges(spark, nodes, edges)
    wdf = edf.withColumn("weight", F.lit(1.0))
    plain = {r["id"]: r["pagerank"] for r in pagerank(ndf, edf).collect()}
    weighted = {
        r["id"]: r["pagerank"]
        for r in pagerank(ndf, wdf, weight_col="weight").collect()
    }
    assert plain == weighted  # bit-identical, not approx


def _py_ppr(nodes, edges, seeds, damping=0.85, iterations=5):
    n_s = len(seeds)
    p = {v: (1.0 / n_s if v in seeds else 0.0) for v in nodes}
    out = {}
    for s, d in edges:
        out.setdefault(s, []).append(d)
    ranks = dict(p)
    for _ in range(iterations):
        contrib = {v: 0.0 for v in nodes}
        for s, targets in out.items():
            share = ranks[s] / len(targets)
            for t in targets:
                contrib[t] += share
        dang = sum(r for v, r in ranks.items() if v not in out)
        ranks = {
            v: (1.0 - damping) * p[v] + damping * (contrib[v] + dang * p[v])
            for v in nodes
        }
    return ranks


def test_personalized_pagerank_matches_python_model(spark):
    from cartography_spark.operators.graphrank import personalized_pagerank

    nodes = ["a", "b", "c", "d", "e"]
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("e", "a")]
    seeds = {"a", "e"}
    ndf, edf = _df_nodes_edges(spark, nodes, edges)
    sdf = spark.createDataFrame([(s,) for s in sorted(seeds)], "id string")
    got = {
        r["id"]: r["pagerank"]
        for r in personalized_pagerank(ndf, edf, sdf).collect()
    }
    want = _py_ppr(nodes, edges, seeds)
    for v in nodes:
        assert got[v] == pytest.approx(want[v], abs=1e-12)
    # Salience is seed-relative: a (a seed + well-fed) outranks d (far).
    assert got["a"] > got["d"]


def test_personalized_pagerank_mass_conserved(spark):
    from cartography_spark.operators.graphrank import personalized_pagerank

    nodes = [f"v{i}" for i in range(15)]
    rng = random.Random(3)
    edges = [
        (s, d)
        for s, d in {
            (f"v{rng.randrange(15)}", f"v{rng.randrange(15)}") for _ in range(30)
        }
        if s != d
    ]
    ndf, edf = _df_nodes_edges(spark, nodes, edges)
    sdf = spark.createDataFrame([("v0",), ("v7",)], "id string")
    total = (
        personalized_pagerank(ndf, edf, sdf, iterations=4)
        .agg(F.sum("pagerank"))
        .collect()[0][0]
    )
    assert total == pytest.approx(1.0, abs=1e-9)


def test_personalized_pagerank_validates_seeds(spark):
    from cartography_spark.operators.graphrank import personalized_pagerank

    ndf, edf = _df_nodes_edges(spark, ["a", "b"], [("a", "b")])
    empty = spark.createDataFrame([], "id string")
    with pytest.raises(ValueError, match="non-empty"):
        personalized_pagerank(ndf, edf, empty)
    unknown = spark.createDataFrame([("zz",)], "id string")
    with pytest.raises(ValueError, match="not in the node set"):
        personalized_pagerank(ndf, edf, unknown)


def test_pagerank_mass_conserved(spark):
    # Dangling redistribution keeps total mass at exactly 1 (up to fp).
    nodes = [f"v{i}" for i in range(20)]
    rng = random.Random(7)
    edges = list(
        {
            (f"v{rng.randrange(20)}", f"v{rng.randrange(20)}")
            for _ in range(40)
        }
    )
    edges = [(s, d) for s, d in edges if s != d]
    ndf, edf = _df_nodes_edges(spark, nodes, edges)
    total = pagerank(ndf, edf, iterations=4).agg(F.sum("pagerank")).collect()[0][0]
    assert total == pytest.approx(1.0, abs=1e-9)


def test_pagerank_partition_count_invariant(spark):
    nodes = [f"v{i}" for i in range(30)]
    rng = random.Random(13)
    edges = list(
        {(f"v{rng.randrange(30)}", f"v{rng.randrange(30)}") for _ in range(80)}
    )
    edges = [(s, d) for s, d in edges if s != d]
    ndf, edf = _df_nodes_edges(spark, nodes, edges)
    a = (
        pagerank(ndf.repartition(1), edf.repartition(1))
        .select("id", F.round("pagerank", 9).alias("r"))
    )
    b = (
        pagerank(ndf.repartition(16), edf.repartition(16))
        .select("id", F.round("pagerank", 9).alias("r"))
    )
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_pagerank_deep_iteration_plan_stays_bounded(spark):
    # The per-iteration localCheckpoint must truncate lineage: without
    # it the plan compounds per round (the components.py discipline).
    nodes = [f"v{i}" for i in range(10)]
    edges = [(f"v{i}", f"v{(i + 1) % 10}") for i in range(10)]
    ndf, edf = _df_nodes_edges(spark, nodes, edges)
    out = pagerank(ndf, edf, iterations=12)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # (A SinglePartition exchange IS expected here — it's the 1-row
    # dangling-mass aggregate, not a data-proportional shuffle.)
    assert len(plan) < 50_000


def _py_hits(nodes, edges, iterations=5):
    import math

    hub = {v: 1.0 for v in nodes}
    auth = {v: 1.0 for v in nodes}
    for _ in range(iterations):
        auth = {v: sum(hub[s] for s, d in edges if d == v) for v in nodes}
        n = math.sqrt(sum(a * a for a in auth.values()))
        auth = {v: (a / n if n else 0.0) for v, a in auth.items()}
        hub = {v: sum(auth[d] for s, d in edges if s == v) for v in nodes}
        n = math.sqrt(sum(h * h for h in hub.values()))
        hub = {v: (h / n if n else 0.0) for v, h in hub.items()}
    return hub, auth


def test_hits_matches_python_model(spark):
    from cartography_spark.operators.graphrank import hits

    nodes = ["a", "b", "c", "d", "e"]
    edges = [("a", "c"), ("b", "c"), ("a", "d"), ("c", "d"), ("e", "a")]
    ndf, edf = _df_nodes_edges(spark, nodes, edges)
    got = {r["id"]: (r["hub"], r["authority"]) for r in hits(ndf, edf).collect()}
    hub, auth = _py_hits(nodes, edges)
    for v in nodes:
        assert got[v][0] == pytest.approx(hub[v], abs=1e-9)
        assert got[v][1] == pytest.approx(auth[v], abs=1e-9)
    # a points at the two best authorities -> top hub; d is fed by the
    # top hub AND the top authority-feeder -> top authority.
    assert got["a"][0] == max(h for h, _ in got.values())
    assert got["d"][1] == max(a for _, a in got.values())


def test_hits_l2_normalized_and_edgeless(spark):
    from cartography_spark.operators.graphrank import hits

    nodes = ["a", "b", "c"]
    ndf = spark.createDataFrame([(v,) for v in nodes], "id string")
    edf = spark.createDataFrame([("a", "b")], "src string, dst string")
    out = hits(ndf, edf, iterations=3).collect()
    assert sum(r["hub"] ** 2 for r in out) == pytest.approx(1.0)
    assert sum(r["authority"] ** 2 for r in out) == pytest.approx(1.0)
    empty = spark.createDataFrame([], "src string, dst string")
    zeroed = hits(ndf, empty, iterations=2).collect()
    assert all(r["hub"] == 0.0 and r["authority"] == 0.0 for r in zeroed)


def _py_triangles(edges):
    und = set()
    for s, d in edges:
        if s != d:
            und.add((min(s, d), max(s, d)))
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    counts = {}
    for a, b, c in itertools.combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for v in (a, b, c):
                counts[v] = counts.get(v, 0) + 1
    return counts


def test_triangles_k4_and_path(spark):
    # K4: every vertex is in C(3,2)=3 triangles; a path has none.
    k4 = [(a, b) for a, b in itertools.combinations(["a", "b", "c", "d"], 2)]
    path = [("p", "q"), ("q", "r"), ("r", "s")]
    edf = spark.createDataFrame(k4 + path, "src string, dst string")
    got = {r["id"]: r["triangles"] for r in triangle_count(edf).collect()}
    assert got == {"a": 3, "b": 3, "c": 3, "d": 3}


def test_triangles_random_graph_matches_bruteforce(spark):
    rng = random.Random(99)
    verts = [f"v{i:02d}" for i in range(18)]
    edges = list(
        {tuple(rng.sample(verts, 2)) for _ in range(70)}
    )
    edf = spark.createDataFrame(edges, "src string, dst string")
    got = {r["id"]: r["triangles"] for r in triangle_count(edf).collect()}
    assert got == _py_triangles(edges)


def test_triangles_direction_and_duplicate_insensitive(spark):
    # Same undirected graph given as mixed directions + duplicates.
    tri = [("a", "b"), ("b", "c"), ("c", "a")]
    noisy = tri + [("b", "a"), ("a", "c"), ("b", "c"), ("c", "b")]
    e1 = spark.createDataFrame(tri, "src string, dst string")
    e2 = spark.createDataFrame(noisy, "src string, dst string")
    r1 = {r["id"]: r["triangles"] for r in triangle_count(e1).collect()}
    r2 = {r["id"]: r["triangles"] for r in triangle_count(e2).collect()}
    assert r1 == r2 == {"a": 1, "b": 1, "c": 1}


def test_clustering_coefficient_hand_computed(spark):
    from cartography_spark.operators.graphrank import clustering_coefficient

    # Triangle a-b-c plus pendant d hanging off a:
    #   a: deg 3, 1 tri -> 2*1/(3*2) = 1/3
    #   b, c: deg 2, 1 tri -> 1.0
    #   d: deg 1 -> 0.0
    edf = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "d")],
        "src string, dst string",
    )
    got = {
        r["id"]: (r["deg"], r["triangles"], r["coeff"])
        for r in clustering_coefficient(edf).collect()
    }
    assert got["a"] == (3, 1, pytest.approx(1 / 3))
    assert got["b"] == (2, 1, pytest.approx(1.0))
    assert got["c"] == (2, 1, pytest.approx(1.0))
    assert got["d"] == (1, 0, 0.0)


def test_clustering_coefficient_matches_model(spark):
    from cartography_spark.operators.graphrank import clustering_coefficient

    rng = random.Random(5)
    verts = [f"v{i:02d}" for i in range(15)]
    edges = list({tuple(rng.sample(verts, 2)) for _ in range(50)})
    edf = spark.createDataFrame(edges, "src string, dst string")
    tri = _py_triangles(edges)
    deg = {}
    for s, d in edges:
        lo, hi = min(s, d), max(s, d)
        for v in (lo, hi):
            deg[v] = deg.get(v, set())
        deg[lo].add(hi)
        deg[hi].add(lo)
    got = {r["id"]: r for r in clustering_coefficient(edf).collect()}
    assert set(got) == set(deg)
    for v, nbrs in deg.items():
        k, t = len(nbrs), tri.get(v, 0)
        assert got[v]["deg"] == k
        assert got[v]["triangles"] == t
        want = 0.0 if k < 2 else 2.0 * t / (k * (k - 1))
        assert got[v]["coeff"] == pytest.approx(want)


def _py_kcore(edges, k):
    und = {(min(s, d), max(s, d)) for s, d in edges if s != d}
    while True:
        deg = {}
        for a, b in und:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        low = {v for v, c in deg.items() if c < k}
        if not low:
            return deg
        und = {(a, b) for a, b in und if a not in low and b not in low}


def test_kcore_hand_computed(spark):
    from cartography_spark.operators.graphrank import k_core

    # K4 plus a pendant chain: 3-core = exactly the K4 (cascading peel:
    # z goes first, then y exposes x... chain peels one per round).
    k4 = [(a, b) for a, b in itertools.combinations(["a", "b", "c", "d"], 2)]
    chain = [("a", "x"), ("x", "y"), ("y", "z")]
    edf = spark.createDataFrame(k4 + chain, "src string, dst string")
    got = {r["id"]: r["deg"] for r in k_core(edf, k=3).collect()}
    assert got == {"a": 3, "b": 3, "c": 3, "d": 3}


def test_kcore_matches_python_model(spark):
    from cartography_spark.operators.graphrank import k_core

    rng = random.Random(31)
    verts = [f"v{i:02d}" for i in range(20)]
    edges = list({tuple(rng.sample(verts, 2)) for _ in range(60)})
    edf = spark.createDataFrame(edges, "src string, dst string")
    for k in (2, 3, 4):
        got = {r["id"]: r["deg"] for r in k_core(edf, k=k).collect()}
        assert got == _py_kcore(edges, k), f"k={k}"


def test_kcore_max_rounds_caps_peeling(spark):
    from cartography_spark.operators.graphrank import k_core

    # Path a-b-c-d-e at k=2 peels endpoints one round at a time until
    # empty; max_rounds=1 stops after the first peel (b..d remain).
    path = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
    edf = spark.createDataFrame(path, "src string, dst string")
    full = k_core(edf, k=2).collect()
    assert full == []  # converged: a path has no 2-core
    one = {r["id"]: r["deg"] for r in k_core(edf, k=2, max_rounds=1).collect()}
    assert one == {"b": 1, "c": 2, "d": 1}


def test_kcore_rejects_bad_k(spark):
    from cartography_spark.operators.graphrank import k_core

    edf = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError):
        k_core(edf, k=0)


def test_tfidf_hand_computed(spark):
    import math

    from cartography_spark.functions.textstats import tfidf_top_terms

    docs = spark.createDataFrame(
        [
            (1, "apple apple banana"),
            (2, "banana cherry"),
            (3, "cherry cherry cherry durian"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_top_terms(docs, k=2).collect()
    got = {(r["doc_id"], r["term"]): (r["score"], r["term_rank"]) for r in out}

    def idf(df_count):
        return math.log((1.0 + 3) / (1.0 + df_count)) + 1.0

    # doc 1: apple tf=2 df=1, banana tf=1 df=2
    assert got[(1, "apple")][0] == pytest.approx(round(2 * idf(1), 6))
    assert got[(1, "apple")][1] == 1
    assert got[(1, "banana")][1] == 2
    # doc 3: cherry tf=3 df=2 beats durian tf=1 df=1
    assert got[(3, "cherry")][1] == 1
    assert got[(3, "durian")][1] == 2
    # k=2 everywhere
    assert all(rank <= 2 for _, rank in got.values())


def test_tfidf_tie_breaks_by_term(spark):
    from cartography_spark.functions.textstats import tfidf_top_terms

    # zig/zag have identical tf and df -> identical score; term asc wins.
    docs = spark.createDataFrame(
        [(1, "zig zag"), (2, "zig zag")], "doc_id long, text string"
    )
    out = tfidf_top_terms(docs, k=1).collect()
    assert {(r["doc_id"], r["term"]) for r in out} == {(1, "zag"), (2, "zag")}


# ---------------------------------------------------------------- paths

def _py_shortest_paths(edges, seeds, rounds, weights=None):
    """Sequential full-relaxation Bellman-Ford: dist after round i =
    min cost over paths with <= i edges."""
    dist = {s: 0 for s in seeds}
    for _ in range(rounds):
        new = dict(dist)
        for idx, (s, d) in enumerate(edges):
            if s in dist:
                c = dist[s] + (1 if weights is None else weights[idx])
                if d not in new or c < new[d]:
                    new[d] = c
        dist = new
    return dist


def test_shortest_paths_matches_python_model(spark):
    from cartography_spark.operators.graphrank import shortest_paths

    nodes = ["a", "b", "c", "d", "e", "f"]
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("a", "c"), ("e", "f")]
    ndf, edf = _df_nodes_edges(spark, nodes, edges)
    seeds = spark.createDataFrame([("a",)], "id string")
    for rounds in (0, 1, 2, 3):
        got = {
            r["id"]: r["dist"]
            for r in shortest_paths(ndf, edf, seeds, rounds=rounds).collect()
        }
        assert got == _py_shortest_paths(edges, {"a"}, rounds)
    # f is only reachable from e — multi-source picks both components.
    seeds2 = spark.createDataFrame([("a",), ("e",)], "id string")
    got2 = {
        r["id"]: r["dist"]
        for r in shortest_paths(ndf, edf, seeds2, rounds=3).collect()
    }
    assert got2 == _py_shortest_paths(edges, {"a", "e"}, 3)


def test_shortest_paths_weighted_prefers_cheaper_long_path(spark):
    from cartography_spark.operators.graphrank import shortest_paths

    # a->c direct costs 10; a->b->c costs 3: the weighted relaxation
    # must take the longer-but-cheaper path once rounds allow it.
    nodes = ["a", "b", "c"]
    wedges = [("a", "c", 10.0), ("a", "b", 1.0), ("b", "c", 2.0)]
    ndf = spark.createDataFrame([(v,) for v in nodes], "id string")
    edf = spark.createDataFrame(wedges, "src string, dst string, cost double")
    seeds = spark.createDataFrame([("a",)], "id string")
    one = {
        r["id"]: r["dist"]
        for r in shortest_paths(ndf, edf, seeds, rounds=1, weight_col="cost").collect()
    }
    assert one == {"a": 0.0, "b": 1.0, "c": 10.0}
    two = {
        r["id"]: r["dist"]
        for r in shortest_paths(ndf, edf, seeds, rounds=2, weight_col="cost").collect()
    }
    assert two == {"a": 0.0, "b": 1.0, "c": 3.0}


def test_shortest_paths_random_graph_matches_model(spark):
    from cartography_spark.operators.graphrank import shortest_paths

    rng = random.Random(7)
    nodes = [f"v{i}" for i in range(30)]
    edges = list(
        {
            (rng.choice(nodes), rng.choice(nodes))
            for _ in range(90)
        }
    )
    edges = [(s, d) for s, d in edges if s != d]
    weights = [float(rng.randint(1, 9)) for _ in edges]
    ndf = spark.createDataFrame([(v,) for v in nodes], "id string")
    edf = spark.createDataFrame(
        [(s, d, w) for (s, d), w in zip(edges, weights)],
        "src string, dst string, cost double",
    )
    seeds = spark.createDataFrame([("v0",), ("v1",)], "id string")
    got = {
        r["id"]: r["dist"]
        for r in shortest_paths(ndf, edf, seeds, rounds=6, weight_col="cost").collect()
    }
    assert got == _py_shortest_paths(edges, {"v0", "v1"}, 6, weights)


def test_shortest_paths_validates_seeds(spark):
    from cartography_spark.operators.graphrank import shortest_paths

    ndf, edf = _df_nodes_edges(spark, ["a", "b"], [("a", "b")])
    ghost = spark.createDataFrame([("zz",)], "id string")
    with pytest.raises(ValueError, match="not in the node set"):
        shortest_paths(ndf, edf, ghost, rounds=2)
    with pytest.raises(ValueError, match="rounds"):
        shortest_paths(ndf, edf, ndf.limit(1), rounds=-1)


# ---------------------------------------------------- label propagation

def _py_label_propagation(nodes, edges, iterations):
    """Sequential synchronous LPA with the (count desc, label asc)
    tie-break over the canonical undirected edge set."""
    und = {tuple(sorted((s, d))) for s, d in edges if s != d}
    adj = {}
    for lo, hi in und:
        adj.setdefault(lo, []).append(hi)
        adj.setdefault(hi, []).append(lo)
    labels = {v: v for v in nodes}
    for _ in range(iterations):
        new = {}
        for v in nodes:
            neigh = adj.get(v, [])
            if not neigh:
                new[v] = labels[v]
                continue
            counts = {}
            for u in neigh:
                counts[labels[u]] = counts.get(labels[u], 0) + 1
            new[v] = min(counts, key=lambda l: (-counts[l], l))
        labels = new
    return labels


def test_label_propagation_matches_python_model(spark):
    from cartography_spark.operators.graphrank import label_propagation

    # Two cliques bridged by one edge + an isolated node.
    nodes = ["a", "b", "c", "x", "y", "z", "iso"]
    edges = [
        ("a", "b"), ("b", "c"), ("a", "c"),
        ("x", "y"), ("y", "z"), ("x", "z"),
        ("c", "x"),
    ]
    ndf, edf = _df_nodes_edges(spark, nodes, edges)
    for iters in (1, 2, 3):
        got = {
            r["id"]: r["label"]
            for r in label_propagation(ndf, edf, iterations=iters).collect()
        }
        assert got == _py_label_propagation(nodes, edges, iters)
    # Isolated node always keeps its own label.
    assert got["iso"] == "iso"


def test_label_propagation_random_graph_matches_model(spark):
    from cartography_spark.operators.graphrank import label_propagation

    rng = random.Random(21)
    nodes = [f"v{i:02d}" for i in range(24)]
    edges = list(
        {(rng.choice(nodes), rng.choice(nodes)) for _ in range(60)}
    )
    ndf, edf = _df_nodes_edges(spark, nodes, edges)
    got = {
        r["id"]: r["label"]
        for r in label_propagation(ndf, edf, iterations=4).collect()
    }
    assert got == _py_label_propagation(nodes, edges, 4)


def test_label_propagation_direction_insensitive(spark):
    from cartography_spark.operators.graphrank import label_propagation

    nodes = ["a", "b", "c"]
    fwd = [("a", "b"), ("b", "c")]
    rev = [("b", "a"), ("c", "b")]
    ndf, f_df = _df_nodes_edges(spark, nodes, fwd)
    _, r_df = _df_nodes_edges(spark, nodes, rev)
    got_f = sorted(label_propagation(ndf, f_df, 3).collect())
    got_r = sorted(label_propagation(ndf, r_df, 3).collect())
    assert got_f == got_r
