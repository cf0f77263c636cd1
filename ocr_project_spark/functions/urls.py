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
Known simplification: the lowercased prefix spans the whole authority, so
case-sensitive userinfo (``user:pass@host`` — RFC 3986 keeps it
case-sensitive) is folded too; crawl pipelines conventionally drop
userinfo urls outright, so the canonical key being case-folded there is
harmless for corpus keying and keeps the expression one regex.
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
    # drop default ports ("?": a query can directly follow the authority —
    # http://h:80?x=1 — and the fragment is already gone by this point)
    u = F.regexp_replace(u, r"^(http://[^/:?]*):80(/|\?|$)", "$1$2")
    u = F.regexp_replace(u, r"^(https://[^/:?]*):443(/|\?|$)", "$1$2")
    return u


def canonicalize_urls(
    pages: DataFrame, url_col: str = "url", out_col: str = "url"
) -> DataFrame:
    """Rewrite the url column to canonical form — run this before resume /
    recrawl-dedup / host aggregation so equivalent spellings share a key."""
    return pages.withColumn(out_col, canonical_url(F.col(url_col)))


def surt_key(col: Column) -> Column:
    """SURT key (Sort-friendly URI Reordering Transform — the public
    Wayback/Common-Crawl CDX index key form): scheme dropped, authority
    lowercased and dot-reversed comma-joined, then ``)`` + the rest of
    the url — ``https://sub.Example.com/a/b?q=1`` →
    ``com,example,sub)/a/b?q=1``. Sorting by SURT clusters a registered
    domain's every host and path into one contiguous range, which is what
    makes range-scans over a url-keyed 100 TB index work. Feed it
    CANONICAL urls (:func:`canonical_url` — fragment gone, default ports
    stripped); a remaining non-default port follows the reversed host
    (``com,example,www:8080)``), matching the published form. Pure JVM
    expression chain, zero exchange."""
    host = F.lower(
        F.regexp_extract(col, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)", 1)
    )
    port = F.regexp_extract(
        col, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/:?#]+(:[0-9]+)", 1
    )
    rest = F.regexp_replace(col, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")
    return F.concat(
        F.array_join(F.reverse(F.split(host, r"\.")), ","),
        port,
        F.lit(")"),
        rest,
    )


# Soft spam-fragment list and spam-heavy TLDs, after the published URL
# filtering stage of C4 (Raffel et al. 2020, "bad words" URL screening)
# and RefinedWeb (Penedo et al. 2023, §3.1 URL filtering: word fragments
# scored inside the url + a TLD blocklist). Deliberately tiny and pinned:
# the operator contract is the scoring machinery; production swaps in the
# full public lists without touching the plan shape.
SPAM_URL_WORDS = (
    "casino",
    "poker",
    "viagra",
    "xxx",
    "escort",
    "webcam",
    "torrent",
    "keygen",
)
SPAM_TLDS = ("xyz", "top", "loan", "click", "work", "gq", "cf", "tk", "ml")

_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]*)"


def url_spam_scores(
    pages: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """RefinedWeb-style URL filtering signals, one row per input row:

    - ``n_spam_words``     — total occurrences of the pinned spam
      fragments anywhere in the lowercased url (fragment-inside-word
      matches count, per the published soft-blocklist rule);
    - ``bad_tld``          — host ends in a spam-heavy TLD;
    - ``n_host_digits`` / ``host_len`` — digit mass in the hostname
      (machine-generated spam farms: ``x93142.xyz``); the
      ``digit_heavy_host`` gate is exact integer cross-multiplication
      (2·digits > len), never a float threshold;
    - ``path_depth``       — '/' count in the path (doorway-page chains);
      reported as a FEATURE, not part of the gate — depth has no
      scale-free threshold, so callers pick their own cutoff;
    - ``url_suspect``      — any binary signal fired: spam words present,
      bad TLD, or digit-heavy host.

    Every signal is a pure JVM expression chain (lower / replace / length
    / regexp on the url column — whole-stage codegen, zero exchange), and
    every one is exactly replayable in ANSI SQL, so the driver oracle
    checks the scoring byte-for-byte. At 100 TB this runs inside the scan
    projection: filters on ``url_suspect`` push down ahead of extraction."""
    u = F.lower(F.col(url_col))
    host = F.regexp_extract(u, _HOST_RE, 1)
    path = F.regexp_replace(
        F.regexp_replace(u, r"^[a-z][a-z0-9+.-]*://[^/]*", ""), r"[?#].*$", ""
    )
    n_spam = None
    for w in SPAM_URL_WORDS:
        occ = (
            (F.length(u) - F.length(F.replace(u, F.lit(w), F.lit(""))))
            / F.lit(len(w))
        ).cast("long")
        n_spam = occ if n_spam is None else n_spam + occ
    n_host_digits = (
        F.length(host) - F.length(F.regexp_replace(host, r"[0-9]", ""))
    ).cast("long")
    host_len = F.length(host).cast("long")
    bad_tld = host.rlike(r"\.(" + "|".join(SPAM_TLDS) + r")$")
    path_depth = (
        F.length(path) - F.length(F.replace(path, F.lit("/"), F.lit("")))
    ).cast("long")
    digit_heavy = n_host_digits * 2 > host_len
    return pages.select(
        F.col(id_col).alias(id_col),
        *[F.col(c) for c in keep],
        host.alias("host"),
        n_spam.alias("n_spam_words"),
        bad_tld.alias("bad_tld"),
        n_host_digits.alias("n_host_digits"),
        host_len.alias("host_len"),
        digit_heavy.alias("digit_heavy_host"),
        path_depth.alias("path_depth"),
        (
            (n_spam > 0) | bad_tld | digit_heavy
        ).alias("url_suspect"),
    )
