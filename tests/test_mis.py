"""Deterministic maximal independent set (operators/graphrank.py).

The engine runs Luby-style rounds with FIXED priorities; the model is
the SEQUENTIAL greedy MIS of the (pri, id) order — a different
algorithm computing the same well-defined set, so agreement checks
the fixpoint semantics, not the round schedule.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cartography_spark.operators.graphrank import maximal_independent_set


def greedy_mis(nodes_pri, edges):
    """Sequential greedy over ascending (pri, id): keep v iff no
    already-kept neighbor."""
    adj = {n: set() for n in nodes_pri}
    for s, d in edges:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    kept = set()
    for n in sorted(nodes_pri, key=lambda n: (nodes_pri[n], n)):
        if not (adj[n] & kept):
            kept.add(n)
    return kept


def _frames(spark, nodes_pri, edges):
    ndf = spark.createDataFrame(
        [(n, p) for n, p in nodes_pri.items()], "id string, pri string"
    )
    if edges:
        edf = spark.createDataFrame(list(edges), "src string, dst string")
    else:
        edf = ndf.select(F.col("id").alias("src"), F.col("id").alias("dst")).where(
            F.lit(False)
        )
    return ndf, edf


def _run(spark, nodes_pri, edges):
    ndf, edf = _frames(spark, nodes_pri, edges)
    rows = maximal_independent_set(ndf, edf).collect()
    assert {r["id"] for r in rows} == set(nodes_pri)
    return {r["id"] for r in rows if r["kept"]}


def test_mis_matches_sequential_greedy_hand_graph(spark):
    # Path a-b-c-d with priorities making b the global min: greedy
    # keeps {b, d} (a and c blocked by b), NOT the larger {a, c} —
    # pinning that the set is the greedy fixpoint, not a maximum IS.
    nodes = {"a": "2", "b": "1", "c": "3", "d": "4"}
    edges = [("a", "b"), ("b", "c"), ("c", "d")]
    got = _run(spark, nodes, edges)
    assert got == greedy_mis(nodes, edges) == {"b", "d"}


def test_mis_matches_greedy_on_random_graphs(spark):
    # Deterministic pseudo-random graphs at three densities.
    for n_edges in (20, 60, 120):
        nodes = {f"n{i:02d}": f"{(i * 37) % 100:02d}" for i in range(30)}
        edges = set()
        x = 99991 + n_edges
        for _ in range(n_edges):
            x = (x * 1103515245 + 12345) % (1 << 31)
            s = x % 30
            x = (x * 1103515245 + 12345) % (1 << 31)
            d = x % 30
            edges.add((f"n{s:02d}", f"n{d:02d}"))
        got = _run(spark, nodes, sorted(edges))
        assert got == greedy_mis(nodes, sorted(edges)), f"n_edges={n_edges}"


def test_mis_is_independent_and_maximal(spark):
    nodes = {f"n{i:02d}": f"{(i * 53) % 100:02d}" for i in range(24)}
    edges = sorted(
        {
            (f"n{(i * 7) % 24:02d}", f"n{(i * 11 + 3) % 24:02d}")
            for i in range(50)
        }
    )
    kept = _run(spark, nodes, edges)
    adj = {n: set() for n in nodes}
    for s, d in edges:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    # Independence: no kept pair is adjacent.
    for n in kept:
        assert not (adj[n] & kept)
    # Maximality: every unkept node has a kept neighbor.
    for n in set(nodes) - kept:
        assert adj[n] & kept, n


def test_mis_keeps_more_than_component_dedup_on_chained_similarity(spark):
    # A similarity chain a-b-c-d-e is ONE connected component (CC
    # retention keeps 1 doc) but its MIS keeps ceil(5/2)=3 mutually
    # non-duplicate docs — the retention win the operator exists for.
    nodes = {c: c for c in "abcde"}
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
    kept = _run(spark, nodes, edges)
    assert kept == {"a", "c", "e"}
    assert len(kept) == 3 > 1


def test_mis_partition_invariant(spark):
    nodes = {f"n{i:02d}": f"{(i * 29) % 100:02d}" for i in range(20)}
    edges = sorted(
        {(f"n{(i * 3) % 20:02d}", f"n{(i * 5 + 1) % 20:02d}") for i in range(30)}
    )
    ndf, edf = _frames(spark, nodes, edges)
    a = sorted(map(tuple, maximal_independent_set(ndf, edf).collect()))
    b = sorted(
        map(
            tuple,
            maximal_independent_set(ndf.repartition(7), edf.repartition(5)).collect(),
        )
    )
    assert a == b


def test_mis_no_edges_keeps_everything(spark):
    nodes = {c: c for c in "xyz"}
    kept = _run(spark, nodes, [])
    assert kept == {"x", "y", "z"}
