"""HLL sketch: bit-level python-model parity, both estimator branches,
the register-merge property, accuracy bounds, and NULL/count-distinct
semantics."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from cartography_spark.operators.sketches import _alpha, hll_distinct, hll_registers


def _py_hll(values, p=8):
    m = 2**p
    shift = 32 - p
    regs = {}
    for v in values:
        h = int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16)
        b, rem = h >> shift, h % (2**shift)
        rank = (shift + 1) if rem == 0 else (shift + 1 - rem.bit_length())
        regs[b] = max(regs.get(b, 0), rank)
    sum_inv = sum(2.0**-r for r in regs.values()) + (m - len(regs))
    raw = _alpha(m) * m * m / sum_inv
    v_empty = m - len(regs)
    if raw <= 2.5 * m and v_empty > 0:
        return m * math.log(m / v_empty)
    return raw


def test_hll_matches_python_model_both_branches(spark):
    # 40 distinct -> linear counting; 3000 distinct -> raw estimator.
    for n in (40, 3000):
        df = spark.createDataFrame(
            [("g", i) for i in range(n)], "grp string, val long"
        )
        got = hll_distinct(df, ["grp"], "val").collect()[0]["approx_distinct"]
        assert got == pytest.approx(_py_hll(range(n)), rel=1e-12)


def test_hll_duplicates_do_not_move_the_estimate(spark):
    base = [("g", i) for i in range(500)]
    df1 = spark.createDataFrame(base, "grp string, val long")
    df3 = spark.createDataFrame(base * 3, "grp string, val long")
    a = hll_distinct(df1, ["grp"], "val").collect()[0]["approx_distinct"]
    b = hll_distinct(df3, ["grp"], "val").collect()[0]["approx_distinct"]
    assert a == b


def test_hll_accuracy_within_bounds(spark):
    # std error ~= 1.04/sqrt(m); allow 4 sigma.
    for p, n in ((8, 2000), (10, 5000)):
        df = spark.createDataFrame(
            [("g", f"u{i}") for i in range(n)], "grp string, val string"
        )
        got = hll_distinct(df, ["grp"], "val", p=p).collect()[0]["approx_distinct"]
        tol = 4 * 1.04 / math.sqrt(2**p)
        assert abs(got - n) / n < tol, (p, n, got)


def test_hll_registers_merge_by_max(spark):
    # Sketch(A ∪ B) == estimate over max-merged registers of A and B.
    a = spark.createDataFrame([("g", i) for i in range(300)], "grp string, val long")
    b = spark.createDataFrame(
        [("g", i) for i in range(200, 700)], "grp string, val long"
    )
    union_est = hll_distinct(a.unionAll(b), ["grp"], "val").collect()[0][
        "approx_distinct"
    ]
    merged = (
        hll_registers(a, ["grp"], "val")
        .unionAll(hll_registers(b, ["grp"], "val"))
        .groupBy("grp", "bucket")
        .agg(F.max("rank").alias("rank"))
    )
    m = 256
    folded = merged.groupBy("grp").agg(
        (F.sum(F.pow(F.lit(0.5), F.col("rank"))) + (F.lit(m) - F.count("*"))).alias(
            "sum_inv"
        ),
        (F.lit(m) - F.count("*")).alias("v"),
    )
    row = folded.collect()[0]
    raw = _alpha(m) * m * m / row["sum_inv"]
    est = m * math.log(m / row["v"]) if raw <= 2.5 * m and row["v"] > 0 else raw
    assert union_est == pytest.approx(est, rel=1e-12)


def test_hll_ignores_nulls_and_groups_independently(spark):
    df = spark.createDataFrame(
        [("a", "x"), ("a", "y"), ("a", None), ("b", "x")],
        "grp string, val string",
    )
    got = {
        r["grp"]: r["approx_distinct"]
        for r in hll_distinct(df, ["grp"], "val").collect()
    }
    assert got["a"] == pytest.approx(_py_hll(["x", "y"]), rel=1e-12)
    assert got["b"] == pytest.approx(_py_hll(["x"]), rel=1e-12)


def test_hll_validates_p(spark):
    df = spark.createDataFrame([("g", 1)], "grp string, val long")
    for bad in (3, 17):
        with pytest.raises(ValueError, match="p must be"):
            hll_distinct(df, ["grp"], "val", p=bad)


# ------------------------------------------------------------ hyperball

def _py_hyperball(edges, rounds, p=6):
    """Sequential model: exact ball sets -> the same HLL estimate
    (sketch-of-union == union-of-sketches, so estimating the exact
    ball through _py_hll is bit-equivalent to register max-merge)."""
    nodes = {v for e in edges for v in e}
    adj = {}
    for s, d in set(edges):
        adj.setdefault(s, set()).add(d)
    balls = {v: {v} for v in nodes}
    for _ in range(rounds):
        balls = {
            v: balls[v] | set().union(*(balls[w] for w in adj.get(v, ())) or [set()])
            for v in nodes
        }
    return {v: _py_hll(sorted(b), p=p) for v, b in balls.items()}


def test_hyperball_matches_python_model(spark):
    from cartography_spark.operators.graphrank import hyperball

    edges = [
        ("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"),
        ("a", "c"), ("e", "a"),
    ]
    edf = spark.createDataFrame(edges, "src string, dst string")
    for rounds in (0, 1, 2, 3):
        got = {
            r["id"]: r["approx_reach"]
            for r in hyperball(edf, rounds=rounds).collect()
        }
        want = _py_hyperball(edges, rounds)
        assert set(got) == set(want)
        for v in want:
            assert got[v] == pytest.approx(want[v], rel=1e-12), (rounds, v)


def test_hyperball_tracks_exact_reach_within_bounds(spark):
    import random as _random

    from cartography_spark.operators.graphrank import hyperball

    rng = _random.Random(5)
    nodes = [f"v{i:03d}" for i in range(120)]
    edges = list({(rng.choice(nodes), rng.choice(nodes)) for _ in range(400)})
    edges = [(s, d) for s, d in edges if s != d]
    edf = spark.createDataFrame(edges, "src string, dst string")
    got = {r["id"]: r["approx_reach"] for r in hyperball(edf, rounds=3, p=8).collect()}
    # exact 3-hop balls
    adj = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
    balls = {v: {v} for v in {x for e in edges for x in e}}
    for _ in range(3):
        balls = {v: b | set().union(*(balls[w] for w in adj.get(v, ())) or [set()])
                 for v, b in balls.items()}
    tol = 4 * 1.04 / math.sqrt(256)
    for v, b in balls.items():
        assert abs(got[v] - len(b)) / len(b) < tol, (v, len(b), got[v])


def test_hyperball_partition_count_invariant_and_validates(spark):
    from cartography_spark.operators.graphrank import hyperball

    edges = [(f"v{i}", f"v{(i * 5 + 2) % 17}") for i in range(17)]
    e1 = spark.createDataFrame(edges, "src string, dst string").repartition(1)
    e9 = spark.createDataFrame(edges, "src string, dst string").repartition(9)
    a = sorted(map(tuple, hyperball(e1, rounds=2).collect()))
    b = sorted(map(tuple, hyperball(e9, rounds=2).collect()))
    assert a == b
    with pytest.raises(ValueError, match="rounds"):
        hyperball(e1, rounds=-1)


# ------------------------------------------------------------ count-min

def _py_count_min(values, queries, depth=4, width=64, seed="cm"):
    counters = {}
    for v in values:
        for r in range(depth):
            b = _pick2(f"{seed}{r}|{v}", width)
            counters[(r, b)] = counters.get((r, b), 0) + 1
    return {
        q: min(counters.get((r, _pick2(f"{seed}{r}|{q}", width)), 0) for r in range(depth))
        for q in queries
    }


def _pick2(key, denom):
    return int(hashlib.md5(key.encode()).hexdigest()[:8], 16) % denom


def test_count_min_matches_python_model_and_overestimates(spark):
    from collections import Counter

    from cartography_spark.operators.sketches import (
        count_min_counters,
        count_min_estimate,
    )

    import random as _random
    rng = _random.Random(13)
    # zipf-ish: heavy value v0, long tail; width 16 forces collisions.
    values = [f"v{min(int(rng.expovariate(0.5)), 30)}" for _ in range(800)]
    df = spark.createDataFrame([(v,) for v in values], "val string")
    counters = count_min_counters(df, "val", depth=3, width=16)
    est = {
        r["val"]: r["est"]
        for r in count_min_estimate(counters, df, "val", depth=3, width=16).collect()
    }
    want = _py_count_min(values, set(values), depth=3, width=16)
    assert est == want
    true = Counter(values)
    assert all(est[v] >= true[v] for v in true)           # one-sided error
    assert any(est[v] > true[v] for v in true)            # collisions visible
    heavy = max(true, key=lambda v: true[v])
    assert est[heavy] <= true[heavy] + len(values) // 8   # CM bound-ish sanity


def test_count_min_counters_merge_by_sum(spark):
    from pyspark.sql import functions as F

    from cartography_spark.operators.sketches import (
        count_min_counters,
        count_min_estimate,
    )

    a = spark.createDataFrame([(f"v{i % 5}",) for i in range(40)], "val string")
    b = spark.createDataFrame([(f"v{i % 7}",) for i in range(30)], "val string")
    whole = count_min_counters(a.unionAll(b), "val")
    merged = (
        count_min_counters(a, "val")
        .unionAll(count_min_counters(b, "val"))
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    e1 = count_min_estimate(whole, a.unionAll(b), "val").collect()
    e2 = count_min_estimate(merged, a.unionAll(b), "val").collect()
    assert sorted(map(tuple, e1)) == sorted(map(tuple, e2))


def test_count_min_validates(spark):
    from cartography_spark.operators.sketches import count_min_counters

    df = spark.createDataFrame([("x",)], "val string")
    with pytest.raises(ValueError, match="depth"):
        count_min_counters(df, "val", depth=0)


def test_neighborhood_function_matches_per_round_hyperball(spark):
    from cartography_spark.operators.graphrank import (
        hyperball,
        neighborhood_function,
    )

    edges = [
        ("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("e", "a"),
    ]
    edf = spark.createDataFrame(edges, "src string, dst string")
    curve = {
        r["r"]: r["avg_reach"]
        for r in neighborhood_function(edf, max_r=3).collect()
    }
    for r in range(4):
        per_node = hyperball(edf, rounds=r).collect()
        want = sum(x["approx_reach"] for x in per_node) / len(per_node)
        assert curve[r] == pytest.approx(want, rel=1e-12)
    # monotone non-decreasing in r
    assert curve[0] <= curve[1] <= curve[2] <= curve[3]


def test_effective_diameter_on_a_path_graph(spark):
    from cartography_spark.operators.graphrank import effective_diameter

    # Directed cycle of 8: every ball grows by exactly one node per
    # round until it saturates at 8 — NF is linear, so the q-quantile
    # radius is analytic: N(r) = min(r+1, 8) modulo sketch noise.
    edges = [(f"v{i}", f"v{(i + 1) % 8}") for i in range(8)]
    edf = spark.createDataFrame(edges, "src string, dst string")
    d = effective_diameter(edf, q=0.99, max_r=8, p=10)
    assert 5.5 < d <= 7.01, d
    with pytest.raises(ValueError, match="q must be"):
        effective_diameter(edf, q=0.0)


# ----------------------------------------------------------- bloom

def test_bloom_never_false_negative_and_fp_rate_sane(spark):
    from cartography_spark.operators.sketches import bloom_bits, bloom_maybe_contains

    members = [f"m{i}" for i in range(60)]
    others = [f"x{i}" for i in range(400)]
    mdf = spark.createDataFrame([(v,) for v in members], "val string")
    adf = spark.createDataFrame([(v,) for v in members + others], "val string")
    bits = bloom_bits(mdf, "val", m_bits=1024, k=3)
    got = {
        r["val"]: r["maybe_member"]
        for r in bloom_maybe_contains(adf, bits, "val", m_bits=1024, k=3).collect()
    }
    assert all(got[v] for v in members)              # no false negatives, ever
    fp = sum(got[v] for v in others)
    # (1 - e^(-3*60/1024))^3 ~ 0.4%; 4x slack over 400 probes
    assert fp <= 8, fp


def test_bloom_matches_python_model(spark):
    from cartography_spark.operators.sketches import bloom_bits, bloom_maybe_contains

    members = [f"m{i}" for i in range(25)]
    probes = [f"p{i}" for i in range(50)] + members[:5]
    mdf = spark.createDataFrame([(v,) for v in members], "val string")
    pdf = spark.createDataFrame([(v,) for v in probes], "val string")
    m, k = 128, 3
    bits = bloom_bits(mdf, "val", m_bits=m, k=k)
    got = {
        r["val"]: r["maybe_member"]
        for r in bloom_maybe_contains(pdf, bits, "val", m_bits=m, k=k).collect()
    }
    bitset = {
        _pick2(f"bf{i}|{v}", m) for v in members for i in range(k)
    }
    want = {
        v: all(_pick2(f"bf{i}|{v}", m) in bitset for i in range(k)) for v in probes
    }
    assert got == want
    # bit tables themselves agree with the model
    assert {r["bit"] for r in bits.collect()} == bitset


def test_bloom_bits_merge_by_union_and_validate(spark):
    from cartography_spark.operators.sketches import bloom_bits, bloom_maybe_contains

    a = spark.createDataFrame([(f"a{i}",) for i in range(20)], "val string")
    b = spark.createDataFrame([(f"b{i}",) for i in range(20)], "val string")
    whole = bloom_bits(a.unionAll(b), "val", m_bits=512)
    merged = bloom_bits(a, "val", m_bits=512).unionAll(
        bloom_bits(b, "val", m_bits=512)
    ).distinct()
    assert {r["bit"] for r in whole.collect()} == {r["bit"] for r in merged.collect()}
    with pytest.raises(ValueError, match="m_bits"):
        bloom_bits(a, "val", m_bits=1)


def test_bloom_keeps_duplicate_probe_rows(spark):
    from cartography_spark.operators.sketches import bloom_bits, bloom_maybe_contains

    mdf = spark.createDataFrame([("x",)], "val string")
    # distinct rows sharing a value each keep a verdict...
    pdf = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "y")], "rid long, val string"
    )
    bits = bloom_bits(mdf, "val", m_bits=128)
    got = sorted(
        (r["rid"], r["maybe_member"])
        for r in bloom_maybe_contains(pdf, bits, "val", m_bits=128).collect()
    )
    assert got[0] == (1, True) and got[1] == (2, True)
    # ...and EXACT duplicate rows keep their multiplicity AND verdict
    # (the regression: grouping on row columns merged their probe
    # counts into sum = 2k != k -> a false negative for a member).
    dup = spark.createDataFrame([("x",), ("x",), ("z",)], "val string")
    got2 = sorted(
        (r["val"], r["maybe_member"])
        for r in bloom_maybe_contains(dup, bits, "val", m_bits=128).collect()
    )
    assert got2[0] == ("x", True) and got2[1] == ("x", True)
    assert len(got2) == 3


def test_harmonic_centrality_matches_exact_on_small_graph(spark):
    from cartography_spark.operators.graphrank import harmonic_centrality

    # p=12 (4096 registers) on a 6-node graph: the HLL estimate of a
    # <=6-element set is linear-counting-exact enough that the sketch
    # harmonic equals the EXACT harmonic within 1%.
    edges = [
        ("a", "b"), ("b", "c"), ("c", "d"), ("a", "e"), ("e", "f"),
    ]
    edf = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r["id"]: r["harmonic"]
        for r in harmonic_centrality(edf, max_r=4, p=12).collect()
    }
    # exact forward-distance harmonic within 4 hops
    nodes = {v for e in edges for v in e}
    adj = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
    import math

    for v in nodes:
        dist = {v: 0}
        frontier = {v}
        for r in range(1, 5):
            frontier = {
                x for u in frontier for x in adj.get(u, ()) if x not in dist
            }
            for x in frontier:
                dist[x] = r
        want = sum(1.0 / d for u, d in dist.items() if d > 0)
        assert got[v] == pytest.approx(want, rel=0.01), (v, want, got[v])


def test_harmonic_centrality_validates(spark):
    from cartography_spark.operators.graphrank import harmonic_centrality

    edf = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError, match="max_r"):
        harmonic_centrality(edf, max_r=0)


# ------------------------------------------------------------- KMV

def test_kmv_jaccard_tracks_exact_overlap(spark):
    from cartography_spark.operators.sketches import kmv_jaccard_pairs, kmv_sketch

    # Three sets with known overlaps over a 4000-element universe:
    # A = [0, 2000), B = [1000, 3000) (J(A,B) = 1/3),
    # C = [3000, 4000) (disjoint from both).
    rows = (
        [("A", f"v{i}") for i in range(0, 2000)]
        + [("B", f"v{i}") for i in range(1000, 3000)]
        + [("C", f"v{i}") for i in range(3000, 4000)]
    )
    df = spark.createDataFrame(rows, "g string, v string")
    sk = kmv_sketch(df, ["g"], "v", k=256)
    got = {
        (r["group_a"], r["group_b"]): r["jaccard_est"]
        for r in kmv_jaccard_pairs(sk, "g", k=256).collect()
    }
    assert got[("A", "C")] == 0.0 and got[("B", "C")] == 0.0
    # J=1/3 within ~4 sigma of sqrt(J(1-J)/k)
    tol = 4 * (1 / 3 * 2 / 3 / 256) ** 0.5
    assert abs(got[("A", "B")] - 1 / 3) < tol, got[("A", "B")]


def test_kmv_sketch_is_bottom_k_of_distinct_hashes(spark):
    import hashlib

    from cartography_spark.operators.sketches import kmv_sketch

    vals = [f"x{i}" for i in range(50)] * 3  # duplicates must not matter
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v string")
    got = sorted(r["h"] for r in kmv_sketch(df, ["g"], "v", k=10).collect())
    want = sorted(
        int(hashlib.md5(v.encode()).hexdigest()[:8], 16) for v in set(vals)
    )[:10]
    assert got == want
    with pytest.raises(ValueError, match="k must be"):
        kmv_sketch(df, ["g"], "v", k=0)


def test_kmv_union_merge_property(spark):
    from pyspark.sql import functions as F

    from cartography_spark.operators.sketches import kmv_sketch

    a = spark.createDataFrame([("g", f"a{i}") for i in range(300)], "g string, v string")
    b = spark.createDataFrame([("g", f"b{i}") for i in range(300)], "g string, v string")
    whole = sorted(r["h"] for r in kmv_sketch(a.unionAll(b), ["g"], "v", k=64).collect())
    # union + re-bottom-k of the members' sketches == sketch of the union
    from pyspark.sql.window import Window

    merged_rows = (
        kmv_sketch(a, ["g"], "v", k=64)
        .unionAll(kmv_sketch(b, ["g"], "v", k=64))
        .distinct()
        .withColumn("rn", F.row_number().over(Window.partitionBy("g").orderBy("h")))
        .where(F.col("rn") <= 64)
    )
    merged = sorted(r["h"] for r in merged_rows.collect())
    assert whole == merged


def test_bloom_probe_plan_broadcasts_the_bit_table(spark):
    from cartography_spark.operators.sketches import bloom_bits, bloom_maybe_contains

    mdf = spark.createDataFrame([(f"m{i}",) for i in range(50)], "val string")
    pdf = spark.createDataFrame([(f"p{i}",) for i in range(200)], "val string")
    bits = bloom_bits(mdf, "val", m_bits=1024)
    plan = (
        bloom_maybe_contains(pdf, bits, "val", m_bits=1024)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the bit table must ride as a broadcast, never a shuffled join
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
