"""URL canonicalization rules, one by one, plus idempotence and the
grouped dedup summary."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cartography_spark.functions.urls import canonical_url, dedup_by_canonical_url


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r["c"] for r in df.select(canonical_url("url").alias("c")).collect()]


def test_each_rule(spark):
    cases = {
        # fragment dropped
        "https://a.com/x#frag": "https://a.com/x",
        # scheme + host lowercased, path case KEPT
        "HTTPS://WWW.Ex.COM/Path/X": "https://www.ex.com/Path/X",
        # default ports stripped, non-default kept
        "https://a.com:443/x": "https://a.com/x",
        "http://a.com:80/x": "http://a.com/x",
        "http://a.com:8080/x": "http://a.com:8080/x",
        # trailing slashes stripped; root collapses to no path
        "https://a.com/x///": "https://a.com/x",
        "https://a.com/": "https://a.com",
        "https://a.com": "https://a.com",
        # tracking params dropped, rest sorted; empty query drops '?'
        "https://a.com/x?utm_source=f&b=2&a=1": "https://a.com/x?a=1&b=2",
        "https://a.com/x?fbclid=1&gclid=2&ref=h": "https://a.com/x",
        "https://a.com/x?b=2&a=1": "https://a.com/x?a=1&b=2",
        # a param merely CONTAINING a tracking name survives
        "https://a.com/x?xref=1": "https://a.com/x?xref=1",
    }
    got = _canon(spark, list(cases))
    for (raw, want), c in zip(cases.items(), got):
        assert c == want, raw


def test_idempotent(spark):
    urls = [
        "HTTPS://Site3.Example.org:443/page/9/?utm_source=feed&b=2&a=1#top",
        "http://x.com:8080/a/b?z=1&y=2",
    ]
    once = _canon(spark, urls)
    twice = _canon(spark, once)
    assert once == twice


def test_dedup_by_canonical_url_groups_variants(spark):
    raw = [
        "HTTPS://A.com:443/p/1/?utm_source=x&b=2&a=1#f",
        "https://a.com/p/1?a=1&b=2",
        "https://a.com/p/1?a=1&b=2",          # exact repeat
        "https://a.com/p/2",
    ]
    df = spark.createDataFrame([(u,) for u in raw], "url string")
    got = {
        r["canonical_url"]: (r["n_urls"], r["n_distinct_raw"])
        for r in dedup_by_canonical_url(df, "url").collect()
    }
    assert got == {
        "https://a.com/p/1?a=1&b=2": (3, 2),
        "https://a.com/p/2": (1, 1),
    }
