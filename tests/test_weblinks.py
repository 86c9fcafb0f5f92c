"""Web link-graph family: href extraction must equal the generator's
planted outlinks exactly (the link analog of the golden-text pins),
host aggregation must be partition-invariant and single-shuffle, and
the frontier classification's url join must agree with the arithmetic
in-crawl derivation."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from cartography_spark.functions.weblinks import (
    crawl_frontier,
    extract_links,
    host_graph,
)
from cartography_spark.sources.pages import (
    DOMAINS,
    _DOMAIN_CDF,
    _link_targets,
    _mix,
    _pick,
    synthesize_pages,
)


def _expected_links(n: int, seed: int) -> set[tuple[str, str]]:
    """Pure-numpy recompute of every planted (src_url, dst_url)."""
    ids = np.arange(n, dtype=np.uint64)
    key = _mix(ids, seed)
    sdom = _pick(_mix(key, 1), _DOMAIN_CDF)
    n_links, tids, tdoms, _anch = _link_targets(key, seed)
    out = set()
    for j in range(n):
        src = f"https://{DOMAINS[int(sdom[j])]}/page/{j}"
        for t in range(int(n_links[j])):
            dst = f"https://{DOMAINS[int(tdoms[t][j])]}/page/{int(tids[t][j])}"
            out.add((src, dst))
    return out


def test_extracted_links_equal_planted_links(spark):
    n, seed = 200, 5
    pages = synthesize_pages(spark, n, seed=seed)
    got = {(r["src_url"], r["dst_url"]) for r in extract_links(pages).collect()}
    assert got == _expected_links(n, seed)
    # 1..3 links per page, so the multiset is bounded; every page has
    # at least one outlink.
    counts = (
        extract_links(pages).groupBy("src_url").count().select("count").collect()
    )
    assert all(1 <= r["count"] <= 3 for r in counts)
    assert len(counts) == n


def test_relative_nav_links_are_excluded(spark):
    pages = synthesize_pages(spark, 50, seed=1)
    links = extract_links(pages)
    bad = links.where(~F.col("dst_url").rlike(r"^https://site\d{2}\.example\.org/page/\d+$"))
    assert bad.count() == 0


def test_links_do_not_leak_into_extracted_text(spark):
    """The outlinks live in the footer, which the extractor drops —
    the golden-text contract must hold unchanged."""
    from cartography_spark.functions.textextract import extract_text

    pages = synthesize_pages(spark, 100, seed=2)
    got = extract_text(pages.select("url", "html"), "html", "text")
    joined = got.alias("g").join(pages.select("url", "text").alias("p"), "url")
    assert joined.where("g.text <> p.text").count() == 0
    # footer markup (anchor urls) must never leak into extracted text
    assert joined.where(F.col("g.text").contains("example.org")).count() == 0


def test_host_graph_partition_invariant_and_single_shuffle(spark):
    a = host_graph(extract_links(synthesize_pages(spark, 300, seed=3, partitions=2)))
    b = host_graph(extract_links(synthesize_pages(spark, 300, seed=3, partitions=13)))
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
    total = a.agg(F.sum("n_links")).collect()[0][0]
    n_link_rows = extract_links(synthesize_pages(spark, 300, seed=3)).count()
    assert total == n_link_rows
    a.collect()
    plan = a._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange hashpartitioning") == 1
    assert "SinglePartition" not in final


def test_crawl_frontier_join_agrees_with_arithmetic_membership(spark):
    """The url equi-join's in-crawl counts must equal the generator's
    tid < n derivation — the planted dst url IS the target's real url."""
    from cartography_spark.sources.pages import LINK_UNIVERSE

    n, seed = 400, 42
    pages = synthesize_pages(spark, n, seed=seed)
    got = {
        r["src_host"]: (r["n_internal"], r["n_frontier"])
        for r in crawl_frontier(extract_links(pages), pages).collect()
    }
    ids = np.arange(n, dtype=np.uint64)
    key = _mix(ids, seed)
    sdom = _pick(_mix(key, 1), _DOMAIN_CDF)
    n_links, tids, _, _anch = _link_targets(key, seed)
    expected: dict[str, list[int]] = {}
    for j in range(n):
        host = DOMAINS[int(sdom[j])]
        e = expected.setdefault(host, [0, 0])
        for t in range(int(n_links[j])):
            e[0 if int(tids[t][j]) < n else 1] += 1
    assert got == {h: (a, b) for h, (a, b) in expected.items()}
    # Some of both classes must exist at this scale (n < LINK_UNIVERSE).
    assert n < LINK_UNIVERSE
    assert sum(v[0] for v in got.values()) > 0
    assert sum(v[1] for v in got.values()) > 0


def test_host_pagerank_mass_conserved(spark):
    from cartography_spark.queries.catalog import web_host_pagerank

    out = web_host_pagerank(spark, "/root/testdata/sf0.01")
    total = out.agg(F.sum("pagerank")).collect()[0][0]
    assert abs(total - 1.0) < 1e-3
    assert out.where(F.col("pagerank") <= 0).count() == 0


def test_fetch_schedule_packs_rounds_and_prioritizes_inlinks(spark):
    from pyspark.sql import functions as F

    from cartography_spark.functions.weblinks import fetch_schedule

    # 5 frontier urls on one host with distinct inlink counts, rate 2:
    # rounds must fill in priority order; a second host schedules
    # independently from round 0.
    links = []
    counts = {"a": 5, "b": 3, "c": 3, "d": 2, "e": 1}
    for u, c in counts.items():
        links += [(f"https://s/{i}", f"https://h1.x/{u}") for i in range(c)]
    links += [("https://s/0", "https://h2.x/only")]
    ldf = spark.createDataFrame(links, "src_url string, dst_url string")
    crawled = spark.createDataFrame([("https://s/0",)], "url string")
    out = {
        r["url"]: (r["n_inlinks"], r["fetch_round"])
        for r in fetch_schedule(ldf, crawled, rate=2).collect()
    }
    # Priority order on h1: a(5), then b/c tie broken by url asc, d, e.
    assert out["https://h1.x/a"] == (5, 0)
    assert out["https://h1.x/b"] == (3, 0)
    assert out["https://h1.x/c"] == (3, 1)
    assert out["https://h1.x/d"] == (2, 1)
    assert out["https://h1.x/e"] == (1, 2)
    assert out["https://h2.x/only"] == (1, 0)


def test_fetch_schedule_excludes_crawled_and_validates_rate(spark):
    import pytest

    from cartography_spark.functions.weblinks import fetch_schedule

    ldf = spark.createDataFrame(
        [("https://s/0", "https://h.x/seen"), ("https://s/0", "https://h.x/new")],
        "src_url string, dst_url string",
    )
    crawled = spark.createDataFrame([("https://h.x/seen",)], "url string")
    urls = {r["url"] for r in fetch_schedule(ldf, crawled, rate=1).collect()}
    assert urls == {"https://h.x/new"}
    with pytest.raises(ValueError, match="rate"):
        fetch_schedule(ldf, crawled, rate=0)


def test_extract_anchors_matches_generator_plant(spark):
    from cartography_spark.functions.weblinks import extract_anchors
    from cartography_spark.sources.pages import ENTITIES

    n, seed = 250, 42
    pages = synthesize_pages(spark, n, seed=seed)
    got = {}
    for r in extract_anchors(pages).collect():
        k = (r["src_url"], r["dst_url"], r["anchor"])
        got[k] = got.get(k, 0) + 1

    ids = np.arange(n, dtype=np.uint64)
    key = _mix(ids, seed)
    sdom = _pick(_mix(key, 1), _DOMAIN_CDF)
    n_links, tids, tdoms, tanch = _link_targets(key, seed)
    want = {}
    for j in range(n):
        src = f"https://{DOMAINS[int(sdom[j])]}/page/{j}"
        for t in range(int(n_links[j])):
            k = (
                src,
                f"https://{DOMAINS[int(tdoms[t][j])]}/page/{int(tids[t][j])}",
                ENTITIES[int(tanch[t][j])],
            )
            want[k] = want.get(k, 0) + 1
    assert got == want


def test_anchor_entities_argmax_and_counts(spark):
    from cartography_spark.functions.weblinks import anchor_entities

    rows = [
        ("s1", "T", "Spark"),
        ("s2", "T", "Spark"),
        ("s3", "T", "Flink"),
        ("s4", "U", "Beam"),
        ("s5", "U", "Arrow"),  # tie at 1 -> 'Arrow' wins asc
    ]
    df = spark.createDataFrame(
        rows, "src_url string, dst_url string, anchor string"
    )
    got = {r["dst_url"]: r for r in anchor_entities(df).collect()}
    assert got["T"]["top_anchor"] == "Spark"
    assert got["T"]["n_top"] == 2
    assert got["T"]["n_inlinks"] == 3 and got["T"]["n_anchors"] == 2
    assert got["U"]["top_anchor"] == "Arrow" and got["U"]["n_top"] == 1


def test_anchor_entities_partition_invariance(spark):
    from cartography_spark.functions.weblinks import (
        anchor_entities,
        extract_anchors,
    )

    pages = synthesize_pages(spark, 200, seed=5)
    a = {
        tuple(r)
        for r in anchor_entities(
            extract_anchors(pages.repartition(1))
        ).collect()
    }
    b = {
        tuple(r)
        for r in anchor_entities(
            extract_anchors(pages.repartition(11))
        ).collect()
    }
    assert a == b
