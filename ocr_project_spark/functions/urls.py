"""URL canonicalization for crawl-corpus keys (training-data pipeline).

Crawl corpora key everything by url (resume anti-joins, recrawl dedup,
host aggregation), so two spellings of the same page must collapse to one
canonical key BEFORE those operators run. The rules below are the standard
crawl normalizations, each a pure JVM expression (whole-stage codegen — no
Python anywhere), and each individually replayable by a SQL differential
oracle:

- scheme and host lowercased;
- the fragment (``#…``) dropped — never sent to the server;
- tracking query parameters (``utm_*``, ``fbclid``, ``gclid``) dropped,
  including consecutive runs, with separators re-tidied;
- default ports (``:80`` http, ``:443`` https) dropped.

Deliberately NOT done (they change the page identity on real sites):
path-case folding, trailing-slash addition, query-parameter reordering.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_SCHEME_HOST = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/]*"
_TRACKING = r"(?:utm_[a-z]+|fbclid|gclid)=[^&#]*"


def canonical_url(col: Column) -> Column:
    """The canonical form of a url column (pure JVM expression chain)."""
    # lowercase the scheme://host prefix, keep the rest byte-for-byte
    prefix = F.regexp_extract(col, f"({_SCHEME_HOST})", 1)
    u = F.concat(F.lower(prefix), F.regexp_replace(col, _SCHEME_HOST, ""))
    # drop the fragment
    u = F.regexp_replace(u, r"#.*$", "")
    # drop runs of tracking params mid-query ("?utm_a=1&utm_b=2&c=3" → "?c=3")
    u = F.regexp_replace(u, f"([?&])(?:{_TRACKING}&)+", "$1")
    # drop a trailing tracking param with its separator ("?a=1&utm=2" →
    # "?a=1"; a query that was only tracking params disappears entirely)
    u = F.regexp_replace(u, f"[?&]{_TRACKING}$", "")
    # drop default ports
    u = F.regexp_replace(u, r"^(http://[^/:]*):80(/|$)", "$1$2")
    u = F.regexp_replace(u, r"^(https://[^/:]*):443(/|$)", "$1$2")
    return u


def canonicalize_urls(
    pages: DataFrame, url_col: str = "url", out_col: str = "url"
) -> DataFrame:
    """Rewrite the url column to canonical form — run this before resume /
    recrawl-dedup / host aggregation so equivalent spellings share a key."""
    return pages.withColumn(out_col, canonical_url(F.col(url_col)))
