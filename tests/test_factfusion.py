"""Fact fusion (operators/factfusion.py): two-round weighted truth
discovery. Model = a direct sequential Python implementation of the
same voting spec; parity on hand graphs and a deterministic
pseudo-random claim set, plus partition invariance.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from cartography_spark.operators.factfusion import fuse_facts, source_claims


def model_fuse(observations):
    """observations: list of (source, subj, pred, obj). Returns
    {(subj, pred): (obj, n_sources, src_votes, weight, confidence)}."""
    claims = sorted(set(observations))
    # round 0: distinct-source majority
    votes0 = {}
    for src, s, p, o in claims:
        votes0.setdefault((s, p), {}).setdefault(o, set()).add(src)
    win0 = {
        sp: min(objs, key=lambda o: (-len(objs[o]), o))
        for sp, objs in votes0.items()
    }
    # source accuracy (Laplace smoothed)
    per_src = {}
    for src, s, p, o in claims:
        ok = win0[(s, p)] == o
        n, m = per_src.get(src, (0, 0))
        per_src[src] = (n + 1, m + (1 if ok else 0))
    acc = {src: (m + 1) / (n + 2) for src, (n, m) in per_src.items()}
    # round 1: accuracy-weighted
    votes1 = {}
    for src, s, p, o in claims:
        w, nsrc = votes1.get((s, p, o), (0.0, 0))
        votes1[(s, p, o)] = (w + acc[src], nsrc + 1)
    out = {}
    for (s, p), objs in votes0.items():
        cand = {
            o: (round(votes1[(s, p, o)][0], 6), votes1[(s, p, o)][1])
            for o in objs
        }
        obj = min(cand, key=lambda o: (-cand[o][0], o))
        total = sum(w for w, _ in cand.values())
        n_sources = len({src for src, s2, p2, _ in claims if (s2, p2) == (s, p)})
        out[(s, p)] = (
            obj,
            n_sources,
            cand[obj][1],
            round(cand[obj][0], 6),
            round(cand[obj][0] / total, 6),
        )
    return out


def _run(spark, observations, partitions=None):
    df = spark.createDataFrame(
        observations, "source string, subj string, pred string, obj string"
    )
    if partitions:
        df = df.repartition(partitions)
    rows = fuse_facts(df).collect()
    return {
        (r["subj"], r["pred"]): (
            r["obj"],
            r["n_sources"],
            r["src_votes"],
            r["weight"],
            r["confidence"],
        )
        for r in rows
    }


def test_unanimous_fact_has_full_confidence(spark):
    obs = [(f"s{i}", "Spark", "extends", "Hadoop") for i in range(3)]
    got = _run(spark, obs)
    assert got == {("Spark", "extends"): ("Hadoop", 3, 3, *got[("Spark", "extends")][3:])}
    assert got[("Spark", "extends")][4] == 1.0


def test_majority_beats_minority(spark):
    obs = [
        ("a", "X", "p", "V1"),
        ("b", "X", "p", "V1"),
        ("c", "X", "p", "V2"),
    ]
    got = _run(spark, obs)
    assert got[("X", "p")][0] == "V1"
    assert got[("X", "p")][1] == 3 and got[("X", "p")][2] == 2
    assert got == model_fuse(obs)


def test_reliable_sources_flip_a_round0_tie(spark):
    # On (X, p) round 0 ties 2-2; the tie-break alone would pick "A".
    # Sources c, d are wrong about every OTHER fact, so round 1's
    # accuracy weighting hands the fact to the reliable pair's "B".
    obs = [
        ("a", "X", "p", "B"),
        ("b", "X", "p", "B"),
        ("c", "X", "p", "A"),
        ("d", "X", "p", "A"),
    ]
    for i in range(4):
        obs += [
            ("a", f"Y{i}", "q", "T"),
            ("b", f"Y{i}", "q", "T"),
            ("e", f"Y{i}", "q", "T"),
            ("c", f"Y{i}", "q", f"F{i}"),
            ("d", f"Y{i}", "q", f"F{i}"),
        ]
    got = _run(spark, obs)
    assert got[("X", "p")][0] == "B"
    assert got == model_fuse(obs)


def test_vote_stuffing_by_page_duplication_is_inert(spark):
    # One source repeating a claim 50 times still casts one vote.
    obs = [("spam", "X", "p", "BAD")] * 50 + [
        ("a", "X", "p", "GOOD"),
        ("b", "X", "p", "GOOD"),
    ]
    got = _run(spark, obs)
    assert got[("X", "p")][0] == "GOOD"
    claims = source_claims(
        spark.createDataFrame(
            obs, "source string, subj string, pred string, obj string"
        )
    ).collect()
    by_src = {r["source"]: r["n_obs"] for r in claims}
    assert by_src["spam"] == 50


def _pseudo_obs(n=400):
    obs = []
    for i in range(n):
        h = hashlib.md5(f"obs{i}".encode()).hexdigest()
        src = f"host{int(h[:2], 16) % 7}"
        subj = f"E{int(h[2:4], 16) % 12}"
        pred = f"p{int(h[4:6], 16) % 3}"
        obj = f"O{int(h[6:8], 16) % 5}"
        obs.append((src, subj, pred, obj))
    return obs


def test_model_parity_on_pseudo_random_claims(spark):
    obs = _pseudo_obs()
    assert _run(spark, obs) == model_fuse(obs)


def test_partition_invariance(spark):
    obs = _pseudo_obs(200)
    assert _run(spark, obs, partitions=1) == _run(spark, obs, partitions=13)
