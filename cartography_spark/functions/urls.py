"""URL canonicalization for web-crawl dedup: the first dedup a
crawl pipeline runs is not on content but on the URL itself —
`HTTPS://Site.Example.org:443/page/1/?b=2&utm_source=feed&a=1#top`
and `https://site.example.org/page/1?a=1&b=2` are the same fetch.
The reference normalizes asset identity per intel module (e.g. ARN
case/format rules); for webtext the identity key is the canonical URL.

Rules (each one a documented, test-pinned transform):

1. drop the fragment (``#...``),
2. lowercase the scheme and the host,
3. strip an explicit ``:80`` / ``:443`` port from the host,
4. strip trailing slashes from the path (the root path collapses to
   no path at all),
5. drop tracking parameters (``utm_*``, ``fbclid``, ``gclid``,
   ``ref``), sort the surviving query parameters byte-lexicographically
   and re-join; an emptied query drops its ``?``.

Everything is a row-local composition of regex/split/sort primitives
shared byte-for-byte by Spark (Java regex) and DuckDB (RE2) on the
POSIX subset used here — no UDF, no shuffle; at 100 TB this runs
entirely inside the page-scan stage, and the canonical key then feeds
the exact-dedup groupBy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

TRACKING_PREFIXES = ("utm_",)
TRACKING_EXACT = ("fbclid", "gclid", "ref")


def canonical_url(col: Column | str) -> Column:
    """The canonical form of a URL column per the module rules."""
    c = F.col(col) if isinstance(col, str) else col
    nofrag = F.split(c, "#").getItem(0)
    qsplit = F.split(nofrag, "[?]")
    base = qsplit.getItem(0)
    query = F.when(F.size(qsplit) > 1, qsplit.getItem(1)).otherwise(F.lit(""))

    scheme = F.lower(F.regexp_extract(base, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = F.lower(F.regexp_extract(base, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/]+)", 1))
    host = F.regexp_replace(host, r":(80|443)$", "")
    path = F.regexp_extract(base, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/]+(/.*)?$", 1)
    path = F.regexp_replace(path, r"/+$", "")

    params = F.filter(
        F.split(query, "&"),
        lambda x: (x != "")
        & ~x.startswith("utm_")
        & ~F.split(x, "=").getItem(0).isin(*TRACKING_EXACT),
    )
    qjoined = F.array_join(F.array_sort(params), "&")
    qpart = F.when(qjoined != "", F.concat(F.lit("?"), qjoined)).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, path, qpart)


def dedup_by_canonical_url(
    df: DataFrame, url_col: str, out_col: str = "canonical_url"
) -> DataFrame:
    """Group rows by canonical URL: ``(canonical_url, n_urls,
    n_distinct_raw)`` — the crawl-frontier dedup summary (how many
    fetches collapse onto each canonical page). Row-local
    canonicalization into one hash exchange on the canonical key."""
    return (
        df.select(canonical_url(url_col).alias(out_col), F.col(url_col).alias("__raw"))
        .groupBy(out_col)
        .agg(
            F.count("*").alias("n_urls"),
            F.countDistinct("__raw").alias("n_distinct_raw"),
        )
    )
