"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship per-language/backend extraction rollup on
sf0.001. ``queries()`` exposes one callable per implemented operator family
from SURVEY.md §2 (extraction lifecycle, lineage/health, skew observability,
backend comparison) plus the training-data operators (dedup families,
similarity search, text analysis). ``oracle_sql()`` gives the DuckDB
equivalent for every SQL-expressible query; the synthetic ``pages`` table is
a pure function of the driver's ``documents`` table (see
ocr_project_spark/datagen.py), so every extraction invariant — including
per-document byte identity of extracted text, markdown, and span boxes — is
re-derivable with plain SQL over ``documents``.

Every query carries a DuckDB oracle. The hash-based families use invariants
instead of replaying the hash in SQL: dedup_minhash's *verified output*
equals the exact n-gram-Jaccard pairs (candidate recall ≈ 1 at 128/32);
dedup_simhash and the ANN queries (lsh/ivf) run over corpora with planted
exact copies, whose co-location in every bucket/cell is a mathematical
property of the index (identical input ⇒ identical hash), making the
expected answer exact SQL; corpus_percentiles is exact because the GK
sketch is exact below its accuracy bound. The round-3 cluster queries
(dedup_minhash_components) replay connected components
with a recursive-CTE transitive closure over the exact-jaccard pair set;
media_png / media_video predict the REAL PNG/Y4M decodes from planted pixel
formulas; warc_sinks closes the loop extraction → WET/WAT sinks → WARC
parse against ground truth, byte-for-byte.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

# ---------------------------------------------------------------------------
# shared SQL fragments (ALL derived from ocr_project_spark/datagen.py's
# pure-function construction of the pages table)
# ---------------------------------------------------------------------------
_BACKEND = "CASE WHEN doc_id % 2 = 0 THEN 'deepseek-ocr' ELSE 'mineru' END"
_WELL_FORMED = "doc_id % 97 <> 13"
_MALFORMED = "doc_id % 97 = 13"
_N_PARAS = "cast(ceil(len(string_split(text, ' ')) / 8.0) as bigint)"
_N_PAGES = f"least(1 + doc_id % 3, greatest({_N_PARAS}, 1))"

# url spam scoring fragments (url_canonical oracle): occurrence counts of
# the pinned fragment list + the TLD regex, built from the SAME constants
# the operator uses so the lists cannot drift apart
from ocr_project_spark.functions.urls import SPAM_TLDS, SPAM_URL_WORDS  # noqa: E402

_SPAM_SUM = " + ".join(
    f"CAST((length(su) - length(replace(su, '{w}', ''))) / {len(w)} AS BIGINT)"
    for w in SPAM_URL_WORDS
)
_SPAM_TLD_RE = r"\.(" + "|".join(SPAM_TLDS) + r")$"

# mojibake repair chain (text_normalize oracle): the SAME pinned table the
# operator applies, rendered as chr() concatenations so no control byte or
# NBSP has to survive a SQL string literal
from ocr_project_spark.textops import MOJIBAKE_TABLE  # noqa: E402


def _sql_chr(s: str) -> str:
    return " || ".join(f"chr({ord(c)})" for c in s)


_MOJIBAKE_SQL = "orig"
for _bad, _good in MOJIBAKE_TABLE:
    _MOJIBAKE_SQL = (
        f"replace({_MOJIBAKE_SQL}, {_sql_chr(_bad)}, {_sql_chr(_good)})"
    )

# the planted mojibake segment of q_text_normalize, chr()-rendered
_MOJI_SEG_SQL = _sql_chr(
    " don\u00e2\u20ac\u2122t \u00e2\u20ac\u0153ok"
    "\u00e2\u20ac\x9d caf\u00c3\u00a9 \u00e2\u20ac\u201d"
)

# markdown surfaces (shared by markdown_identity / unified_fields /
# prompt_modes oracles; all assume a CTE exposing doc_id, words, n_paras,
# n_pages)
_MD_PARA_JOIN = """array_to_string(
    list_transform(
        generate_series(1, n_paras),
        i -> array_to_string(
            list_slice(words, (i - 1) * 8 + 1, i * 8), ' ')
    ),
    chr(10) || chr(10))"""

# html pdf path: per-page marker lines + byte-exact page separators (P6)
_MD_HTML_PDF = """array_to_string(
  list_transform(generate_series(1, n_pages), p ->
    array_to_string(
      list_transform(
        generate_series((p-1)*n_paras//n_pages + 1,
                        p*n_paras//n_pages),
        jj ->
          '<|ref|>'
          || array_to_string(
               list_slice(words, (jj-1)*8+1, (jj-1)*8+8), ' ')
          || '<|/ref|><|det|>[[40, '
          || least(40 + (jj - 1
                 - ((p-1)*n_paras//n_pages))*60, 930)
          || ', 959, '
          || least(least(40 + (jj - 1
                 - ((p-1)*n_paras//n_pages))*60, 930) + 50,
                   980)
          || ']]<|/det|>'
      ), chr(10))
    || chr(10) || '<--- Page ' || p || ' --->' || chr(10)
  ), chr(10))"""

# html pdf path in free mode: plain paragraph lines + page separators
_MD_FREE_PDF = """array_to_string(
  list_transform(generate_series(1, n_pages), p ->
    array_to_string(
      list_transform(
        generate_series((p-1)*n_paras//n_pages + 1,
                        p*n_paras//n_pages),
        jj -> array_to_string(
            list_slice(words, (jj-1)*8+1, (jj-1)*8+8), ' ')
      ), chr(10))
    || chr(10) || '<--- Page ' || p || ' --->' || chr(10)
  ), chr(10))"""

_MD_CASE = f"""CASE
     WHEN doc_id % 2 = 1 OR n_pages = 1 THEN
       -- layout arm / html image path: paragraphs joined
       -- with a blank line (P2 projection)
       {_MD_PARA_JOIN}
     ELSE
       {_MD_HTML_PDF}
   END"""

_ERR_STR = """CASE WHEN doc_id % 2 = 0
     THEN 'no text blocks detected in document'
     ELSE 'invalid PAGEDOC payload: truncated layout tree'
END"""

# per-backend lineage rollup CTE + health-status grading (shared by
# lineage_health / backend_listing)
_LINEAGE_CTE = f"""l AS (
    SELECT {_BACKEND} AS backend,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN {_WELL_FORMED} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_success,
           CAST(sum(CASE WHEN {_MALFORMED} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_failed,
           CAST(sum(CASE WHEN {_WELL_FORMED} THEN n_chars ELSE 0 END)
                AS BIGINT) AS n_bytes
    FROM documents GROUP BY 1
)"""
_STATUS_CASE = """CASE WHEN n_failed / CAST(n_docs AS DOUBLE) >= 0.5 THEN 'unhealthy'
     WHEN n_failed / CAST(n_docs AS DOUBLE) > 0.01 THEN 'degraded'
     ELSE 'healthy' END"""

_DEDUP_CORPUS = """
corpus AS (
    SELECT doc_id, text, lang FROM documents
    UNION ALL
    SELECT doc_id + 100000, text, lang FROM documents
    UNION ALL
    SELECT doc_id + 200000, regexp_replace(text, '^[^ ]+', 'zzznear'), lang
    FROM documents
)
"""

_JACCARD_DE_SQL = f"""
WITH {_DEDUP_CORPUS},
sh AS (
    SELECT doc_id,
           list_distinct(list_transform(
               generate_series(1, greatest(len(string_split(text, ' ')) - 2, 1)),
               i -> array_to_string(list_slice(string_split(text, ' '), i, i + 2), ' ')
           )) AS shingles
    FROM corpus WHERE lang = 'de'
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       len(list_intersect(a.shingles, b.shingles))
           / CAST(len(list_distinct(a.shingles || b.shingles)) AS DOUBLE) AS jaccard
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE len(list_intersect(a.shingles, b.shingles))
          / CAST(len(list_distinct(a.shingles || b.shingles)) AS DOUBLE) >= 0.8
"""


# V-structure planted corpus for the cluster queries: for each document,
# a head-edited variant (low id), a tail-edited variant (+100000), and the
# original (+200000). head~orig and tail~orig are near-dups; head~tail
# usually is not — so the component {i, i+100000, i+200000} exists only
# through transitive closure, which is exactly what the cluster operator
# must get right and per-pair dropping gets wrong. The leading-space anchor
# on the tail pattern forces a word-boundary match so Spark's and DuckDB's
# leftmost-match regexp_replace agree byte-for-byte.
_VEE_CORPUS = """
corpus AS (
    SELECT doc_id,
           regexp_replace(text, '^[^ ]+ [^ ]+ [^ ]+', 'zzka zzkb zzkc') AS text,
           lang
    FROM documents
    UNION ALL
    SELECT doc_id + 100000,
           regexp_replace(text, ' [^ ]+ [^ ]+ [^ ]+$', ' zzqa zzqb zzqc'),
           lang
    FROM documents
    UNION ALL
    SELECT doc_id + 200000, text, lang FROM documents
)
"""

# Shared oracle blocks: exact shingle-jaccard pairs over the de slice of
# whatever `corpus` CTE precedes them, then the symmetric edge list and its
# recursive transitive closure — DuckDB's WITH RECURSIVE replays the
# engine's large-star/small-star connected components exactly (UNION
# deduplicates, so cyclic pair graphs terminate).
_SH_PAIRS_CLOSURE_DE = """
sh AS (
    SELECT doc_id,
           list_distinct(list_transform(
               generate_series(1, greatest(len(string_split(text, ' ')) - 2, 1)),
               i -> array_to_string(list_slice(string_split(text, ' '), i, i + 2), ' ')
           )) AS shingles
    FROM corpus WHERE lang = 'de'
),
pairs AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.shingles, b.shingles))
              / CAST(len(list_distinct(a.shingles || b.shingles)) AS DOUBLE) >= 0.8
),
edges(src, dst) AS (
    SELECT id_a, id_b FROM pairs UNION SELECT id_b, id_a FROM pairs
),
reach(src, dst) AS (
    SELECT src, dst FROM edges
    UNION
    SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
)
"""

_MINHASH_COMPONENTS_SQL = f"""
WITH RECURSIVE {_VEE_CORPUS.strip().rstrip()}, {_SH_PAIRS_CLOSURE_DE},
comp AS (
    SELECT src AS doc_id, LEAST(MIN(dst), src) AS cluster_id
    FROM reach GROUP BY src
)
SELECT c.doc_id,
       CAST(COALESCE(k.cluster_id, c.doc_id) AS BIGINT) AS cluster_id,
       COALESCE(k.cluster_id, c.doc_id) = c.doc_id AS kept
FROM corpus c LEFT JOIN comp k ON c.doc_id = k.doc_id
WHERE c.lang = 'de'
"""


def _hex_int(col_expr: str, offset: int, nchars: int = 4) -> str:
    """SQL for parsing ``nchars`` lowercase-hex chars at 1-based ``offset``
    of ``col_expr`` into an int (DuckDB has no hex→int cast)."""
    return " + ".join(
        f"(strpos('0123456789abcdef', substr({col_expr}, {offset + i}, 1)) - 1)"
        f" * {16 ** (nchars - 1 - i)}"
        for i in range(nchars)
    )



def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ocr_project_spark.datagen import synthesize_pages

    return synthesize_pages(spark, sf_dir)


def _results(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ocr_project_spark.pipeline import run_extraction

    return run_extraction(_pages(spark, sf_dir), repartition=False)


def _dedup_corpus_de(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ocr_project_spark.dedup import dedup_test_corpus

    return dedup_test_corpus(_docs(spark, sf_dir)).where(F.col("lang") == "de")


# ---------------------------------------------------------------------------
# query implementations
# ---------------------------------------------------------------------------
def q_flagship_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(lang, backend) successful-extraction doc counts and byte sums."""
    res = _results(spark, sf_dir)
    docs = _docs(spark, sf_dir)
    return (
        res.where("success")
        .join(F.broadcast(docs.select("doc_id", "lang")), "doc_id")
        .groupBy("lang", "backend")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_bytes").alias("n_bytes"))
    )


def q_extract_text_identity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North rule: extracted text must be byte-identical per document."""
    return _results(spark, sf_dir).where("success").select("doc_id", "text")


def q_extract_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed payloads fail with the reference's exact error shapes."""
    return (
        _results(spark, sf_dir)
        .where("NOT success")
        .select("doc_id", "backend", "file_type", "markdown", "error")
    )


def q_page_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-page decomposition/assembly: page counts and file types."""
    return (
        _results(spark, sf_dir)
        .where("success")
        .select(
            "doc_id",
            F.col("page_count").cast("long").alias("page_count"),
            "file_type",
            F.size("processed_pages").cast("long").alias("n_processed"),
        )
    )


def q_span_boxes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span boundaries (P3): one row per span for every html-arm doc (the
    synthetic box index resets per page; the oracle replays the paragraph→
    page assignment with the exact floor-division slice math)."""
    res = _results(spark, sf_dir)
    return (
        res.where("success AND backend = 'deepseek-ocr'")
        .select("doc_id", F.explode("spans").alias("s"))
        .select(
            "doc_id",
            F.col("s.ref").alias("ref"),
            F.col("s.x1").cast("long").alias("x1"),
            F.col("s.y1").cast("long").alias("y1"),
            F.col("s.x2").cast("long").alias("x2"),
            F.col("s.y2").cast("long").alias("y2"),
        )
    )


def q_markdown_identity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markdown byte-identity for EVERY successful document: the layout
    arm's blank-line join, the html image path's P2 projection, and the
    html pdf path's marker+page-separator assembly — the oracle rebuilds
    all three surfaces in SQL."""
    return _results(spark, sf_dir).where("success").select("doc_id", "markdown")


def q_raw_output_identity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wire-format byte-identity: the layout arm's middle_json/metadata
    JSON for every doc plus the html arm's marker string for single-page
    docs (the multi-page html raw is a JSON envelope whose content is
    already covered by markdown_identity + span_boxes)."""
    res = _results(spark, sf_dir)
    return res.where(
        "success AND (backend = 'mineru' OR page_count = 1)"
    ).select("doc_id", "raw_output")


def q_unified_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unified-response parity fields (reference api_contract.py:182-217):
    ``file_name`` = the url basename the document was fetched as;
    ``source_markdown`` = the constructor default (== markdown) for success
    AND error rows alike. Every row of the corpus is covered."""
    return _results(spark, sf_dir).select("doc_id", "file_name", "source_markdown")


def q_prompt_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-request prompt passthrough on the html arm (reference
    process/config.py:27-37 templates): a mixed corpus cycling the grounding
    template, 'Free OCR.', and 'Parse the figure.' (any explicit prompt
    without the grounding token yields ungrounded output → free mode).
    Free-mode markdown degrades to the sentinel on the image path and to
    plain paragraph pages on the pdf path; text identity holds throughout."""
    pages = _pages(spark, sf_dir).where("doc_id % 2 = 0")
    prompt = (
        F.when(F.col("doc_id") % 3 == 1, F.lit("Free OCR."))
        .when(F.col("doc_id") % 3 == 2, F.lit("Parse the figure."))
        .otherwise(
            F.lit("<image>\n<|grounding|>Convert the document to markdown.")
        )
    )
    from ocr_project_spark.operators.extract import extract_documents

    out = extract_documents(pages.withColumn("prompt", prompt))
    return out.where("success").select("doc_id", "markdown", "text")


def q_locate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's 'rec' prompt (config.py:36): each html doc gets
    'Locate <|ref|>{its first paragraph}<|/ref|> in the image.' — the
    engine answers with det markers for exactly the blocks equal to the
    requested text; the oracle replays the block-match and the page/index
    box math in SQL."""
    from ocr_project_spark.operators.extract import extract_documents

    pages = _pages(spark, sf_dir).where("doc_id % 2 = 0")
    first_para = F.concat_ws(" ", F.slice(F.split("text", " "), 1, 8))
    prompt = F.concat(
        F.lit("Locate <|ref|>"), first_para, F.lit("<|/ref|> in the image.")
    )
    out = extract_documents(pages.withColumn("prompt", prompt))
    return (
        out.where("success")
        .select("doc_id", F.explode("spans").alias("s"))
        .select(
            "doc_id",
            F.col("s.ref").alias("ref"),
            F.col("s.x1").cast("long").alias("x1"),
            F.col("s.y1").cast("long").alias("y1"),
            F.col("s.x2").cast("long").alias("x2"),
            F.col("s.y2").cast("long").alias("y2"),
        )
    )


def q_backend_listing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R6 backend listing joined with the FULL R5 health rollup (reference:
    orchestrator/server.py:383-415 `/backends` + 361-365 health). One query
    drives registry enumeration, lineage_rows, and every health_rollup
    column (n_bytes included), so the round-3 `lineage_health` row is
    subsumed rather than dropped (registry consolidation)."""
    from ocr_project_spark.operators.lineage import backend_listing, lineage_rows

    lineage = lineage_rows(_results(spark, sf_dir))
    out = backend_listing(spark, lineage)
    return out.select(
        "backend", "description", "n_docs", "n_success", "n_failed",
        "n_bytes", "status",
    )


def q_host_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host crawl profile: url counts via the salted two-stage
    aggregation (the skew path a host-keyed stage uses at scale — its
    n_urls must equal the independent host_stats count, so both operators
    are checked against each other AND the oracle) joined with first/last
    capture timestamps; warc_ts is CRAWL_EPOCH + doc_id seconds so the
    oracle re-derives everything arithmetically."""
    from ocr_project_spark.operators.skew import host_stats, salted_host_counts

    pages = _pages(spark, sf_dir)
    counts = salted_host_counts(pages)
    stats = host_stats(pages).select(
        "host",
        F.col("n_urls").alias("n_urls_check"),
        F.unix_timestamp("first_ts").alias("first_epoch"),
        F.unix_timestamp("last_ts").alias("last_epoch"),
    )
    return counts.join(stats, "host")


def q_link_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host link-graph analytics (the Common-Crawl-style host-rank stage a
    web-curation pipeline weights documents by): absolute <a href> harvest
    from the raw html payloads as one JVM regexp projection, host-level
    weighted edge list, per-host fan-out/fan-in, and 3-iteration weighted
    PageRank with uniform dangling redistribution. The planted outlinks
    target doc_id + 7·i (datagen.build_html), so the oracle rebuilds the
    ENTIRE graph — edges, degrees, and all three power iterations — from
    doc_id arithmetic without parsing any HTML, while the engine earns the
    same numbers from the actual href scan. PageRank ships in micro-rank
    integer units (round(rank·1e6)): cross-engine float noise is ~1e-15,
    nine orders below the rounding quantum."""
    from ocr_project_spark.functions.links import (
        extract_outlinks,
        host_degrees,
        host_graph,
        host_pagerank,
    )

    pages = _pages(spark, sf_dir)
    graph = host_graph(extract_outlinks(pages))
    deg = host_degrees(graph)
    pr = host_pagerank(graph, n_iter=3)
    return deg.join(pr, "host").select(
        "host",
        F.col("out_degree").cast("long").alias("out_degree"),
        F.col("in_degree").cast("long").alias("in_degree"),
        F.col("n_outlinks").cast("long").alias("n_outlinks"),
        F.col("n_inlinks").cast("long").alias("n_inlinks"),
        F.round(F.col("pagerank") * 1e6).cast("long").alias("pagerank_micro"),
    )


def q_recrawl_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOTH recrawl operators in one family-tagged row set (subsumes the
    round-3/4 `latest_capture` row).

    `latest` rows — recrawl dedup: union the pages table with a
    1000-second-later recrawl of every url; the window keeps exactly the
    newer capture (epoch seconds, not timestamps: the driver session's
    timezone is not ours, and DuckDB timestamps are naive — integers
    compare portably).

    `delta` rows — CDX-style snapshot diff (crawl_delta): the new
    snapshot deterministically drops every doc_id % 5 = 0 url (`gone`),
    appends a byte to every surviving doc_id % 3 = 0 payload (`changed`),
    and adds a '?v=2' variant of every doc_id % 7 = 1 url (`added`); all
    four statuses fire and the oracle replays them arithmetically."""
    from ocr_project_spark.operators.resume import crawl_delta, latest_capture

    pages = _pages(spark, sf_dir)
    recrawl = pages.withColumn(
        "warc_ts", F.col("warc_ts") + F.expr("INTERVAL 1000 SECONDS")
    )
    kept = latest_capture(pages.unionByName(recrawl))
    latest_rows = kept.select(
        F.lit("latest").alias("family"),
        "url",
        F.unix_timestamp("warc_ts").alias("kept_epoch"),
        F.lit("kept").alias("status"),
    )
    new_snapshot = pages.where("doc_id % 5 != 0").withColumn(
        "html",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat("html", F.lit(bytearray(b"!"))),
        ).otherwise(F.col("html")),
    )
    added = pages.where("doc_id % 7 = 1").withColumn(
        "url", F.concat("url", F.lit("?v=2"))
    )
    delta_rows = crawl_delta(pages, new_snapshot.unionByName(added)).select(
        F.lit("delta").alias("family"),
        "url",
        F.lit(-1).cast("long").alias("kept_epoch"),
        "status",
    )
    return latest_rows.unionByName(delta_rows)


def q_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + RefinedWeb-style URL spam filtering in one
    row set. Every url is deterministically messied (a fragment, a
    tracking-only query, an uppercased host, or an explicit :443 port,
    cycling on doc_id) and must canonicalize back to exactly the clean url
    the oracle rebuilds from doc_id arithmetic. The spam signals then score
    a deterministically spam-planted variant (doc_id % 9 = 4 → spam-word
    path; = 7 → digit-heavy host on a spam TLD; else the clean url), so
    both firing and non-firing paths of every signal are oracle-replayed
    arithmetically (occurrence counts, TLD regex, integer digit-majority
    gate, path depth). Each row also carries the url's SURT key (the
    public Wayback/Common-Crawl CDX index key: host dot-reversed — what
    makes a registered domain one contiguous sort range at 100 TB),
    replayed arithmetically by the oracle."""
    from ocr_project_spark.functions.urls import (
        canonicalize_urls,
        surt_key,
        url_spam_scores,
    )

    pages = _pages(spark, sf_dir)
    prefix = F.regexp_extract("url", r"^(https://[^/]*)", 1)
    rest = F.regexp_replace("url", r"^https://[^/]*", "")
    m = F.col("doc_id") % 4
    messy = (
        F.when(m == 0, F.concat(F.col("url"), F.lit("#section-2")))
        .when(
            m == 1,
            F.concat(F.col("url"), F.lit("?utm_source=feed&utm_medium=rss")),
        )
        .when(m == 2, F.concat(F.upper(prefix), rest))
        .otherwise(F.concat(prefix, F.lit(":443"), rest))
    )
    out = canonicalize_urls(pages.withColumn("url", messy)).select(
        "doc_id", "url"
    )
    s = F.col("doc_id") % 9
    spam_variant = (
        F.when(s == 4, F.concat(F.col("url"), F.lit("/casino-poker-bonus")))
        .when(
            s == 7,
            F.concat(
                F.lit("https://x"),
                F.col("doc_id").cast("string"),
                F.lit("77.xyz/page"),
            ),
        )
        .otherwise(F.col("url"))
    )
    scored = url_spam_scores(
        out.select(
            "doc_id",
            F.col("url").alias("canonical_url"),
            spam_variant.alias("url"),
        ),
        keep=("canonical_url",),
    )
    return scored.select(
        "doc_id",
        F.col("canonical_url").alias("url"),
        surt_key(F.col("canonical_url")).alias("surt"),
        "n_spam_words",
        "bad_tld",
        "n_host_digits",
        "host_len",
        "digit_heavy_host",
        "path_depth",
        "url_suspect",
    )


def q_host_crawl_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A crawl scheduler's per-url plan: the anti-SEO-spam document cap (at
    most 5 urls per host, selected deterministically by md5(url) order —
    replayed rank-exactly) joined with the per-host politeness budget
    (observed span → recommended crawl delay via the salted two-stage host
    aggregation). One query exercises cap_per_host AND host_politeness,
    both replayed arithmetically by the oracle."""
    from ocr_project_spark.operators.skew import cap_per_host, host_politeness

    pages = _pages(spark, sf_dir)
    capped = cap_per_host(pages.select("url"), max_per_host=5).select(
        "url", "host"
    )
    budget = host_politeness(pages).select(
        "host", "n_urls", "recommended_delay_ms"
    )
    return capped.join(budget, "host").select(
        "url", "host", "n_urls", "recommended_delay_ms"
    )


def q_warc_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end WARC path: documents → synthesized WARC segments (real
    ISO-28500 framing, request records interleaved, gzipped one member per
    record — Common Crawl's actual `.warc.gz` layout) → gunzip + record
    parse → html extraction → byte-identical text per doc."""
    import pandas as pd

    from ocr_project_spark.datagen import build_html, url_for, warc_ts_for
    from ocr_project_spark.operators.extract import extract_documents
    from ocr_project_spark.sources.warc import (
        pages_from_warc,
        synthesize_warc_segment,
    )

    def _segments(batches):
        for pdf in batches:
            docs = [
                (
                    url_for(int(d), s, False),
                    warc_ts_for(int(d)),
                    build_html(int(d), t, lg).encode("utf-8"),
                )
                for d, t, lg, s in zip(
                    pdf["doc_id"], pdf["text"], pdf["lang"], pdf["source"]
                )
                if int(d) % 2 == 0
            ]
            yield pd.DataFrame(
                {
                    "content": [
                        synthesize_warc_segment(docs, compression="record")
                    ]
                    if docs
                    else []
                }
            )

    docs = _docs(spark, sf_dir).select("doc_id", "text", "lang", "source")
    segments = docs.mapInPandas(_segments, schema="content binary")
    pages = pages_from_warc(segments).withColumn("backend", F.lit("deepseek-ocr"))
    out = extract_documents(pages)
    return out.where("success").select(
        F.regexp_extract("url", r"doc(\d+)\.", 1).cast("long").alias("doc_id"),
        "text",
    )


def q_page_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R4 semantics through the engine: request pages=[1,3] on every
    multi-page doc; the html arm keeps the exact valid set, the layout arm
    the contiguous range — both replayed by the oracle."""
    pages = _pages(spark, sf_dir).withColumn(
        "pages", F.array(F.lit(1), F.lit(3))
    )
    from ocr_project_spark.operators.extract import extract_documents

    out = extract_documents(pages)
    return out.where("success AND page_count > 1").select(
        "doc_id",
        F.col("page_count").cast("long").alias("page_count"),
        F.concat_ws(",", F.col("processed_pages").cast("array<string>")).alias(
            "processed"
        ),
    )


def q_backend_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9 comparison fan-out: both backends on every doc, side-by-side."""
    from ocr_project_spark.operators.compare import compare_backends

    return compare_backends(_docs(spark, sf_dir))


def q_dedup_blocking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-hash and prefix-blocking dedup ledgers in one tagged row set
    (merges round 4's dedup_exact + dedup_prefix rows) over the
    planted-dup corpus: family='exact' rows carry one row per distinct
    text at min_copies=1 (keeper_id IS the keep-list, n_docs > 1 recovers
    the duplicate groups), family='prefix' rows the 4-word-prefix blocking
    groups with >1 member. Both are single map-side-partial aggregations;
    the oracle replays each family and UNION ALLs them."""
    from ocr_project_spark.dedup import (
        dedup_test_corpus,
        exact_dup_groups,
        prefix_dup_groups,
    )

    corpus = dedup_test_corpus(_docs(spark, sf_dir))
    exact = exact_dup_groups(corpus, min_copies=1).select(
        F.lit("exact").alias("family"),
        F.col("content_md5").alias("group_key"),
        "keeper_id",
        F.col("n_copies").alias("n_docs"),
    )
    prefix = prefix_dup_groups(corpus).select(
        F.lit("prefix").alias("family"),
        F.col("prefix").alias("group_key"),
        "keeper_id",
        "n_docs",
    )
    return exact.unionByName(prefix)


def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs UNION the exact all-pairs n-gram Jaccard
    baseline, family-tagged (round-4 merge of the dedup_minhash and
    dedup_ngram_jaccard queries): both run on the same planted-dup corpus
    at the same threshold, so the row sets must be identical up to the tag
    — the LSH ≡ exact equivalence (candidate recall ≈ 1 at 128 hashes /
    32 bands at j ≥ 0.8) asserted inside one driver row."""
    from ocr_project_spark.dedup import minhash_near_dup_pairs, ngram_jaccard_pairs

    corpus = _dedup_corpus_de(spark, sf_dir)
    mh = minhash_near_dup_pairs(corpus, threshold=0.8, num_hashes=128, bands=32)
    ex = ngram_jaccard_pairs(corpus, threshold=0.8)
    return mh.select(F.lit("minhash").alias("family"), "id_a", "id_b", "jaccard").unionByName(
        ex.select(F.lit("exact").alias("family"), "id_a", "id_b", "jaccard")
    )


def q_nb_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering with a classifier TRAINED IN-ENGINE
    (classify.py — the DCLM/FineWeb-style stage, as count-based multinomial
    Naive Bayes so training is exact-integer and partitioning-independent):
    corpus = documents ('clean') ∪ planted unique-word gibberish ('junk',
    +100000), train on the even-id half of both populations, classify
    everything. The oracle replays training AND inference in SQL; only the
    argmax ships (no float columns) and the minimum argmax margin on this
    corpus is ≈ 11.8 nats — nine orders above cross-engine libm noise."""
    from ocr_project_spark.classify import nb_classify

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    gib = F.concat_ws(
        " ",
        *[
            F.concat(F.lit("gib"), F.col("doc_id").cast("string"), F.lit(f"_{i}"))
            for i in range(12)
        ],
    )
    corpus = docs.select(
        "doc_id", F.lit("clean").alias("label_true"), "text"
    ).unionByName(
        docs.select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.lit("junk").alias("label_true"),
            gib.alias("text"),
        )
    )
    train = corpus.where("doc_id % 2 = 0").select(
        F.col("label_true").alias("label"), "text"
    )
    preds = nb_classify(train, corpus)
    return (
        corpus.select("doc_id", "label_true")
        .join(preds, "doc_id")
        .select(
            "doc_id",
            "label_true",
            "pred_label",
            (F.col("label_true") == F.col("pred_label")).alias("correct"),
        )
    )


def q_dedup_repeated_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level duplication inventory: cross-document repeated 8-word
    spans over the planted-dup corpus (exact aggregation → exact oracle)."""
    from ocr_project_spark.dedup import repeated_ngram_spans

    return repeated_ngram_spans(_dedup_corpus_de(spark, sf_dir), n=8)


def q_dedup_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-span REMOVAL over the planted-dup corpus: documents are
    rewritten with every position covered by a cross-doc repeated 8-gram
    excised (planted exact copies reduce to empty text, the head-edited
    near-dups keep exactly their unique head, natural boilerplate spans
    vanish corpus-wide). The oracle replays the byte-exact string surgery
    in SQL: same gram inventory, same covered-position set, same
    single-space rejoin."""
    from ocr_project_spark.dedup import remove_repeated_spans

    return remove_repeated_spans(_dedup_corpus_de(spark, sf_dir), n=8)


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup over base ∪ planted exact copies (+100000),
    projected to the planted pairs (id_b = id_a + 100000). Identical text ⇒
    identical word multiset ⇒ identical simhash ⇒ the pair is guaranteed
    through chunk banding at hamming 0 — a mathematical invariant of the
    operator at any scale, so the expected set is exact SQL (one pair per
    de-lang doc). General near-dup behavior (hamming ≤ k on one-word edits)
    is covered by tests/test_dedup.py; the corpus's natural near-dup pairs
    land at hash-dependent hamming 2-3 and are excluded by the projection,
    not by weakening the operator."""
    from ocr_project_spark.dedup import simhash_near_dup_pairs

    docs = _docs(spark, sf_dir).select("doc_id", "text", "lang")
    corpus = docs.unionByName(
        docs.select((F.col("doc_id") + 100000).alias("doc_id"), "text", "lang")
    ).where(F.col("lang") == "de")
    out = simhash_near_dup_pairs(corpus, max_hamming=3)
    return out.where(F.col("id_b") - F.col("id_a") == 100000).select(
        "id_a", "id_b", F.col("hamming").cast("long").alias("hamming")
    )


def _vee_corpus_de(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V-structure corpus (see _VEE_CORPUS): head-edit (id), tail-edit
    (+100000), original (+200000) — clusters exist only transitively."""
    docs = _docs(spark, sf_dir).select("doc_id", "text", "lang")
    head = F.regexp_replace(
        "text", r"^[^ ]+ [^ ]+ [^ ]+", "zzka zzkb zzkc"
    )
    tail = F.regexp_replace(
        "text", r" [^ ]+ [^ ]+ [^ ]+$", " zzqa zzqb zzqc"
    )
    return (
        docs.select("doc_id", head.alias("text"), "lang")
        .unionByName(
            docs.select(
                (F.col("doc_id") + 100000).alias("doc_id"),
                tail.alias("text"),
                "lang",
            )
        )
        .unionByName(
            docs.select(
                (F.col("doc_id") + 200000).alias("doc_id"), "text", "lang"
            )
        )
        .where(F.col("lang") == "de")
    )


def q_dedup_minhash_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup components + keep decisions in one row set (merges round
    3's dedup_minhash_clusters + dedup_minhash_keep rows), over the
    V-planted corpus where the {head-edit, tail-edit, original} component
    exists only through transitive closure (head~orig and tail~orig are
    near-dups, head~tail is not): every doc labeled with its component's
    min id (singletons with themselves), ``kept`` = is the component's
    min-id representative — the corpus a training pipeline keeps. The
    oracle replays exact shingle-jaccard pairs + a recursive-CTE closure,
    checking the large-star/small-star engine end-to-end."""
    from ocr_project_spark.components import near_dup_clusters
    from ocr_project_spark.dedup import minhash_near_dup_pairs

    corpus = _vee_corpus_de(spark, sf_dir)
    pairs = minhash_near_dup_pairs(
        corpus, threshold=0.8, num_hashes=128, bands=32
    )
    return near_dup_clusters(corpus, pairs).select(
        "doc_id",
        "cluster_id",
        (F.col("doc_id") == F.col("cluster_id")).alias("kept"),
    )


def q_sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All four ANN families under one contract, tagged by family (round-4
    merge of sim_topk_brute/lsh/ivf, + the new IVF-PQ index):

    - 'brute'  — exact cosine top-5 over the NATURAL corpus; DuckDB
      recomputes every cosine and ranks (cross-engine float check);
    - 'lsh'    — SRP-LSH bucket→candidate→score→rank over the planted-copy
      corpus (top-2 = the two exact copies, a structural guarantee);
    - 'ivf'    — IVF with DISTRIBUTED Lloyd training, same planted answer;
    - 'ivfpq'  — IVF-PQ (Jégou et al. 2011): PQ codes ride the inverted
      lists instead of raw vectors, JVM-side ADC scoring + exact re-rank;
      an identical vector shares the query's cell AND codes, so its ADC is
      the global minimum and re-rank pins cosine 1.0 — same planted answer.

    General-recall behavior of every approximate family vs brute force is
    asserted in tests (test_similarity, test_round4b)."""
    from ocr_project_spark.similarity import (
        brute_force_topk,
        ivf_topk,
        ivfpq_topk,
        lsh_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qs = emb.where("vec_id < 10")
    corpus = _planted_ann_corpus(spark, sf_dir)
    legs = [
        ("brute", brute_force_topk(emb, qs, k=5)),
        ("lsh", lsh_topk(corpus, qs, k=2, n_planes=4, n_tables=8)),
        (
            "ivf",
            ivf_topk(
                corpus, qs, k=2, n_cells=16, n_probe=4, train="distributed"
            ),
        ),
        ("ivfpq", ivfpq_topk(corpus, qs, k=2, n_cells=16, n_probe=4)),
    ]
    out = None
    for family, df in legs:
        tagged = df.select(
            F.lit(family).alias("family"),
            "query_id",
            F.col("rank").cast("long").alias("rank"),
            "neighbor_id",
        )
        out = tagged if out is None else out.unionByName(tagged)
    return out


def q_sim_embed_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs AND the dedup keep-list in one
    tagged row set (round-4 merge of the sim_embed_near_dup and
    sim_dedup_keep queries), over a derived corpus with planted exact
    copies (vec_id + 100000): 'pair' rows are the LSH-candidate +
    exact-cosine-verified near-dup pairs (cross-engine float check —
    DuckDB recomputes every cosine); 'keep' rows are the vec_ids that
    survive connected-component dedup (each copy has a lower-id near-dup
    at cosine ≈ 1.0, so the kept set is exactly the originals)."""
    from ocr_project_spark.components import near_dup_keep
    from ocr_project_spark.similarity import embedding_near_dup_pairs

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    corpus = emb.select("vec_id", "embedding").unionByName(
        emb.select((F.col("vec_id") + 100000).alias("vec_id"), "embedding")
    )
    pairs = embedding_near_dup_pairs(corpus, threshold=0.95)
    keep = near_dup_keep(corpus, pairs.select("id_a", "id_b"), id_col="vec_id")
    return pairs.select(
        F.lit("pair").alias("kind"),
        "id_a",
        "id_b",
        F.round("cosine", 6).alias("cosine"),
    ).unionByName(
        keep.select(
            F.lit("keep").alias("kind"),
            F.col("doc_id").alias("id_a"),
            # sentinels, not NULLs: a NULL BIGINT degrades to float NaN in
            # the driver's pandas-side oracle frame and breaks value hashing
            F.lit(-1).cast("long").alias("id_b"),
            F.lit(-1.0).alias("cosine"),
        )
    )


def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): k-means-cluster the embeddings, dedup
    within clusters only. Over the planted-copy corpus (vec_id + 100000)
    every vector has exactly one semantic duplicate — its exact copy, which
    provably lands in the same cluster (identical vector ⇒ identical
    nearest centroid) at cosine ≈ 1.0, while the natural cosine ceiling
    (~0.51) stays far below the 0.95 threshold — so per-vector dup degree,
    max duplicate cosine, and the kept set are all exact SQL. The
    cluster-scoped recall trade-off (cross-cluster near-dups survive) is
    asserted in tests with pinned centroids."""
    from ocr_project_spark.components import near_dup_keep
    from ocr_project_spark.similarity import semdedup_pairs

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    corpus = emb.unionByName(
        emb.select((F.col("vec_id") + 100000).alias("vec_id"), "embedding")
    )
    pairs = semdedup_pairs(corpus, threshold=0.95, n_cells=8)
    kept = near_dup_keep(corpus, pairs.select("id_a", "id_b"), id_col="vec_id")
    degree = (
        pairs.select(F.col("id_a").alias("vec_id"), "cosine")
        .unionByName(pairs.select(F.col("id_b").alias("vec_id"), "cosine"))
        .groupBy("vec_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sem_dups"),
            F.round(F.max("cosine"), 6).alias("max_dup_cosine"),
        )
    )
    return (
        corpus.select("vec_id")
        .join(degree, "vec_id", "left")
        .join(
            kept.select(F.col("doc_id").alias("vec_id"), F.lit(True).alias("kept")),
            "vec_id",
            "left",
        )
        .select(
            "vec_id",
            F.coalesce("n_sem_dups", F.lit(0)).alias("n_sem_dups"),
            "max_dup_cosine",
            F.coalesce("kept", F.lit(False)).alias("kept"),
        )
    )


def q_diversity_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4-style diversity pruning over the NATURAL embeddings table (no
    planting): cells come from a pinned standard-basis quantizer (centroid
    j = e_j, j < 4), so the oracle replays assignment exactly — the dot
    with a basis vector is the raw coordinate, identical in both engines
    (multiplications by 0/1 and zero-additions are exact in IEEE754) —
    and the per-cell prototypicality ranking + integer-ratio drop rule
    (most prototypical 1/4 of each cell dropped) end-to-end in SQL. A
    genuine full-replay oracle, not a planted invariant."""
    import numpy as np

    from ocr_project_spark.similarity import prototype_prune

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    return prototype_prune(emb, np.eye(64)[:4], drop_num=1, drop_den=4)


def _planted_ann_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embeddings ∪ two planted exact copies per vector (+100000, +200000).
    An exact copy shares every SRP-LSH bucket and every IVF cell with its
    original (identical vector ⇒ identical hyperplane signs / nearest
    centroid), and scores cosine ≈ 1.0 vs a ≤ 0.51 natural ceiling — so the
    top-2 neighbors of each query are its two copies (tie → id asc), a
    mathematical guarantee of the index structure, exact at any scale."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    return (
        emb.unionByName(
            emb.select((F.col("vec_id") + 100000).alias("vec_id"), "embedding")
        ).unionByName(
            emb.select((F.col("vec_id") + 200000).alias("vec_id"), "embedding")
        )
    )


def q_media_video(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both video paths in one tagged row set (round-4 merge of the
    media_frames and media_y4m queries). kind='sampled': 1→N frame
    sampling through the real Arrow plumbing on the deterministic fake
    decode (payload = utf-8 of documents.text, duration a pure function
    of doc_id — frame counts AND content ids sha256(payload || '#frame-i')
    are SQL-replayable). kind='y4m': REAL YUV4MPEG2 container decode —
    synthesized payloads whose per-frame luma planes are a pure integer
    function of (id, frame); the oracle predicts frame count, dimensions
    and Σluma while the engine earns them by walking the real container
    (multimodal.decode_y4m; every_ms=100 at 10 fps samples every frame).
    Sentinels (-1 / '') instead of NULLs — pandas NULL-int degradation."""
    from ocr_project_spark.multimodal import (
        frame_pixel_stats,
        sample_frames,
        synthesize_y4m_media,
    )

    docs = _docs(spark, sf_dir)
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("video").alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            (F.lit(500) + (F.col("doc_id") % 5) * 700).cast("int").alias(
                "duration_ms"
            ),
        ).alias("meta"),
    )
    sampled = sample_frames(media, every_ms=1000, decode="fake").select(
        F.lit("sampled").alias("kind"),
        "media_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        "frame_sha256",
        F.lit(-1).cast("long").alias("width"),
        F.lit(-1).cast("long").alias("height"),
        F.lit(-1).cast("long").alias("luma_sum"),
    )
    y4m_media = synthesize_y4m_media(docs)
    y4m = frame_pixel_stats(y4m_media, every_ms=100, decode="strict").select(
        F.lit("y4m").alias("kind"),
        "media_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        F.lit("").alias("frame_sha256"),
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        F.col("luma_sum").cast("long").alias("luma_sum"),
    )
    return sampled.unionByName(y4m)


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal image-feature pass (fake decode): dimensions derive from
    the payload's sha256 digest, so width/height/content-hash are
    SQL-replayable; the tile plan + feature vector are golden-tested in
    pytest (the ratio-search is not reasonably SQL-expressible)."""
    from ocr_project_spark.multimodal import image_features

    docs = _docs(spark, sf_dir)
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
    )
    out = image_features(media, decode="fake")
    return out.select(
        "media_id",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        "sha256",
    )


def q_media_codecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode across BOTH implemented codecs in one codec-tagged
    row set (registry consolidation: the round-4 `media_png`+`media_jpeg`
    rows merged, neither dropped).

    PNG rows: payloads are synthesized PNGs (gray/RGB alternating, all five
    scanline filters cycling) whose dimensions and pixel values are pure
    integer functions of the doc id, so the oracle predicts
    width/height/Σpixels with plain SQL while the engine earns them by
    actually inflating and unfiltering the PNG bytes (multimodal.decode_png)
    — including the planted corrupt-IDAT rows (id % 31 = 7) that must
    surface as `corrupt`, never dead batches.

    JPEG rows: synthesized block-constant grayscale JPEGs whose decode is
    mathematically LOSSLESS (DC-only blocks, DC quantizer divides the DC
    coefficient exactly — multimodal.synthesize_jpeg_media), so the oracle
    predicts the decode output with integer arithmetic while the engine
    earns it by real marker walk + Huffman decode + dequantization + IDCT
    (jpegcodec.decode_jpeg). Lossy-path accuracy bounds and the
    spec-table/zigzag/IDCT anchors live in pytest."""
    from ocr_project_spark.multimodal import (
        image_pixel_stats,
        synthesize_jpeg_media,
        synthesize_png_media,
    )

    docs = _docs(spark, sf_dir)
    png = image_pixel_stats(synthesize_png_media(docs), decode="strict")
    jpeg = image_pixel_stats(synthesize_jpeg_media(docs), decode="strict")
    return png.withColumn("codec", F.lit("png")).unionByName(
        jpeg.withColumn("codec", F.lit("jpeg"))
    )


def q_media_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-feature plumbing on the deterministic fake path (the real WAV
    decode is pytest-covered — binary WAV payloads are not constructible in
    SQL): every output is a pure function of sha256(payload), replayed by
    the oracle from the digest's hex nibbles."""
    from ocr_project_spark.multimodal import audio_features

    docs = _docs(spark, sf_dir)
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
    )
    out = audio_features(media, decode="fake")
    return out.select(
        "media_id",
        F.col("sample_rate").cast("long").alias("sample_rate"),
        "n_samples",
        "duration_ms",
        "rms_x1000",
        "zero_crossings",
    )


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc quality profile in ONE row set (round-5 merge of the
    text_quality and gopher_gate queries, freeing the registry slot for
    streaming_near_dup without dropping any operator from coverage):
    quality_scores + the quality_gate verdict + both token counters
    (subsuming round 3's text_token_counts) joined with the Gopher-rules
    gate features/verdict (gopher_gate(emit_all=True)) and the
    within-document repetition signals (repetition_signals). The gopher
    side drops its n_words/avg_word_len_x100/stopword_hits columns — they
    are the identical expressions quality_scores already emits — so every
    remaining column is a distinct operator output, all integer-safe for
    an exact SQL replay."""
    from ocr_project_spark.textops import (
        gopher_gate,
        quality_gate,
        quality_scores,
        repetition_signals,
        token_counts,
    )

    docs = _docs(spark, sf_dir)
    scores = quality_scores(docs)
    gate = quality_gate(docs).select("doc_id", F.lit(True).alias("passes_gate"))
    toks = token_counts(docs).select(
        "doc_id",
        F.col("n_ws_tokens").cast("long").alias("n_ws_tokens"),
        F.col("n_bpe_tokens").cast("long").alias("n_bpe_tokens"),
    )
    gopher = gopher_gate(docs, emit_all=True).select(
        "doc_id", "alpha_word_ratio_x100", "passes_gopher"
    )
    rep = repetition_signals(docs).drop("n_words")
    return (
        scores.join(gate, "doc_id", "left")
        .withColumn("passes_gate", F.coalesce("passes_gate", F.lit(False)))
        .join(toks, "doc_id")
        .join(gopher, "doc_id")
        .join(rep, "doc_id")
    )


def q_streaming_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-replay oracle for the incremental cross-batch near-dup index
    (streaming/incremental.py near_dup_stream — previously the only
    pytest-only family): the planted-dup corpus lands as FOUR deterministic
    shards, each drained by its own availableNow micro-batch run against
    the accumulated bucketed index, at the SAME LSH configuration as the
    batch dedup_minhash query (3-gram shingles, 128 hashes / 32 bands,
    threshold 0.8). The shard key offsets each planted variant family
    (base / +100000 exact copy / +200000 near-dup) into a DIFFERENT batch,
    so every planted pair is found via the cross-batch index join, not
    within one batch. The union of per-batch pair emissions must equal the
    exact all-pairs 3-gram-Jaccard SQL closure — the same oracle
    dedup_minhash passes — because a pair (a, b) is emitted exactly when
    its later member's batch joins the index that already holds the
    earlier member's band rows, and LSH candidate recall ≈ 1 at 128/32
    for j ≥ 0.8. Streaming verification runs over xxhash64 shingle-hash
    arrays, the SQL over shingle strings — set sizes coincide absent a
    64-bit collision, making the jaccard doubles bit-identical."""
    import os
    import shutil
    import tempfile

    from ocr_project_spark.streaming.incremental import near_dup_stream

    corpus = _dedup_corpus_de(spark, sf_dir).select("doc_id", "text", "lang")
    work = tempfile.mkdtemp(prefix="stream_nd_")
    inp = os.path.join(work, "docs")
    pairs_out = os.path.join(work, "pairs")
    ckpt = os.path.join(work, "ckpt")
    idx = "nd_q_" + os.path.basename(work).rsplit("_", 1)[-1].lower()
    # variant family (doc_id // 100000) shifts the shard so copies of one
    # base doc land in different micro-batches → genuinely cross-batch pairs
    shard = F.pmod(F.col("doc_id") + F.floor(F.col("doc_id") / 100000), F.lit(4))
    for s in range(4):
        corpus.where(shard == s).coalesce(1).write.mode("append").parquet(inp)
        q = near_dup_stream(
            spark,
            inp,
            idx,
            pairs_out,
            ckpt,
            threshold=0.8,
            n=3,
            num_hashes=128,
            bands=32,
        )
        # bounded wait: a wedged micro-batch must fail THIS query's row,
        # never hang the whole correctness run
        if not q.awaitTermination(600):
            q.stop()
            raise RuntimeError(f"streaming micro-batch {s} did not drain in 600s")
    pairs = (
        spark.read.parquet(pairs_out)
        .select("id_a", "id_b", "jaccard")
        .dropDuplicates(["id_a", "id_b"])
        .localCheckpoint()  # eager: severs lineage from every temp file below
    )
    wh = spark.conf.get("spark.sql.warehouse.dir", "").replace("file:", "")
    for t in (f"{idx}_bands", f"{idx}_hashes"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        if wh:
            shutil.rmtree(os.path.join(wh, t), ignore_errors=True)
    shutil.rmtree(work, ignore_errors=True)
    return pairs


def q_quality_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequency n-gram LM scoring (the CCNet perplexity-filter
    analog) over documents ∪ planted gibberish docs (+100000 on doc_id %
    5 = 0; 12 words each unique to their document, built by the identical
    string expression in Spark and SQL). Every gibberish bigram has
    document frequency 1, so the planted docs score familiarity 0 and fail
    the gate, while natural docs share their bigrams corpus-wide (mean df
    ≈ 28 at sf0.01) and pass; n_grams/n_rare/sum_df are exact integers and
    familiarity is the same int/int IEEE division in both engines. The
    Spark side never materializes gram strings (the Arrow rolling-hash
    pass), the oracle rebuilds them as strings — a cross-representation
    check like the contamination query."""
    from ocr_project_spark.textops import gram_lm_scores

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    gib = F.concat_ws(
        " ",
        *[
            F.concat(F.lit("gib"), F.col("doc_id").cast("string"), F.lit(f"_{i}"))
            for i in range(12)
        ],
    )
    planted = docs.where("doc_id % 5 = 0").select(
        (F.col("doc_id") + 100000).alias("doc_id"), gib.alias("text")
    )
    return gram_lm_scores(docs.unionByName(planted), n=2)


def q_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance-weight data selection (Xie et al. 2023) over
    documents ∪ planted gibberish (+100000 on doc_id % 5 = 0, the
    quality_lm planting), with the doc_id % 5 = 0 natural slice as the
    TARGET corpus. Gibberish bigrams never appear in the target ⇒
    sum_target_df = 0 ⇒ weight exactly 0.0 and not selected; natural docs
    share bigrams with the target slice and score positive weights. The
    integers are exact, the weight is a fixed tree of IEEE double
    divisions (bit-identical cross-engine), and the selected gate is
    DECIMAL cross-multiplication — the oracle rebuilds gram STRINGS in
    DuckDB (cross-representation, like contamination/quality_lm) and
    replays everything."""
    from ocr_project_spark.textops import importance_weights

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    gib = F.concat_ws(
        " ",
        *[
            F.concat(F.lit("gib"), F.col("doc_id").cast("string"), F.lit(f"_{i}"))
            for i in range(12)
        ],
    )
    planted = docs.where("doc_id % 5 = 0").select(
        (F.col("doc_id") + 100000).alias("doc_id"), gib.alias("text")
    )
    corpus = docs.unionByName(planted)
    target = docs.where("doc_id % 5 = 0")
    out = importance_weights(corpus, target, n=2)
    return out.select(
        "doc_id",
        "n_feats",
        "sum_raw_df",
        "sum_target_df",
        "weight",
        "selected",
    )


def q_bloom_seen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dolma-style Bloom-filter seen-set (Soldaini et al. 2024) for
    cross-snapshot dedup: the filter is built from the doc_id % 3 ≠ 0
    slice's keys, then EVERY key probes it. Output per document:
    ``probably_seen`` (the filter's answer), ``exact_seen`` (ground
    truth), ``false_positive`` (their disagreement — zero false negatives
    is the Bloom guarantee, and the driver hash-checks it row by row).
    ``m_bits`` is sized small (2048) so real false positives are exercised
    and inventoried at the driver SF rather than idealized away. The
    oracle rebuilds the filter and every probe in SQL from the identical
    md5 arithmetic (hash_split's conv idiom), bit_or words and all."""
    from ocr_project_spark.bloomset import bloom_build, bloom_probe

    m_bits, k_probes = 2048, 4
    keys = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(F.lit("k"), F.col("doc_id").cast("string")).alias("key"),
    )
    bloom = bloom_build(
        keys.where("doc_id % 3 != 0").select("key"),
        m_bits=m_bits,
        k_probes=k_probes,
    )
    flags = bloom_probe(keys, bloom, m_bits=m_bits, k_probes=k_probes)
    exact = (F.col("doc_id") % 3 != 0).alias("exact_seen")
    return flags.select(
        "doc_id",
        "probably_seen",
        exact,
        (F.col("probably_seen") & ~(F.col("doc_id") % 3 != 0)).alias(
            "false_positive"
        ),
    )


def q_doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document fingerprint suite in one query: whole-text md5 +
    min-shingle md5 (fingerprints) joined with the Karp-Rabin rolling-hash
    winnowing stats (rolling_fingerprints: gram count and minimum gram
    hash, the Horner fold replayed bit-for-bit by DuckDB's list_reduce)."""
    from ocr_project_spark.textops import fingerprints, rolling_fingerprints

    docs = _docs(spark, sf_dir)
    return fingerprints(docs).join(
        rolling_fingerprints(docs).select("doc_id", "n_grams", "min_hash"),
        "doc_id",
    )


def q_corpus_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus profile: exact aggregates (corpus_stats) joined
    with the mergeable-sketch word-length percentiles (corpus_percentiles
    — exact below the GK accuracy bound, so DuckDB's quantile_disc replays
    them)."""
    from ocr_project_spark.textops import corpus_percentiles, corpus_stats

    docs = _docs(spark, sf_dir)
    return corpus_stats(docs).join(corpus_percentiles(docs), "lang")


def q_warc_sinks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOTH Common-Crawl distribution sinks round-tripped in one
    format-tagged row set (subsumes the round-4 `wet_roundtrip` row).

    WET rows: extraction successes → WARC conversion segments, one per
    Arrow batch → parsed back through the WARC source in conversion mode;
    the (url, text) record set must equal the well-formed ground truth
    byte-for-byte regardless of how rows were cut into segments — sink
    framing, Content-Length arithmetic, and the conversion-record parse
    are all on the hook.

    WAT rows: pages → outlink harvest → WARC *metadata* segments whose
    payload is canonical JSON link metadata (sources/warc.wat_from_pages)
    → parsed back in metadata mode → JVM from_json → explode. EVERY page
    must surface (zero-outlink pages as one empty-payload row), and every
    planted link must survive serialize→frame→parse→decode — the oracle
    replays the whole record set from doc_id arithmetic."""
    from ocr_project_spark.sources.warc import (
        pages_from_warc,
        wat_from_pages,
        wet_from_results,
    )

    pages = _pages(spark, sf_dir)
    res = _results(spark, sf_dir).where("success").select("url", "text")
    wet_back = pages_from_warc(
        wet_from_results(res), content_col="segment", record_types=("conversion",)
    )
    wet_rows = wet_back.select(
        F.lit("wet").alias("fmt"),
        "url",
        F.decode("html", "UTF-8").alias("payload"),
    )
    wat_back = pages_from_warc(
        wat_from_pages(pages), content_col="segment", record_types=("metadata",)
    )
    meta = F.from_json(
        F.decode("html", "UTF-8"),
        "struct<links:array<struct<path:string,url:string>>,url:string>",
    )
    wat_rows = (
        wat_back.select("url", F.explode_outer(meta.getField("links")).alias("l"))
        .select(
            F.lit("wat").alias("fmt"),
            "url",
            F.coalesce(F.col("l.url"), F.lit("")).alias("payload"),
        )
    )
    return wet_rows.unionByName(wat_rows)


def q_corpus_partitioning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document corpus release decisions in one row set (merges round
    3's doc_splits + token_shards rows): the md5-bucket train/val/test
    assignment (hash_split — a pure function of the id, invariant to
    partitioning/row order, where df.sample is neither) joined with the
    ≤10k-token greedy shard packing (shard_by_token_budget — the
    distributed per-bucket prefix sum, which must equal the single global
    cumulative-sum window the oracle runs)."""
    from ocr_project_spark.textops import hash_split, shard_by_token_budget

    docs = _docs(spark, sf_dir)
    return hash_split(docs).join(shard_by_token_budget(docs), "doc_id")


def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode + whitespace canonicalization WITH mojibake repair over a
    corpus planted with a messy suffix (cp1252 mojibake — curly quote,
    double quote via the unmapped 0x9d byte, Ã© and an em dash — then
    CRLF, decomposed combining accents, a double space, a BEL control
    char, NBSP): the mojibake chain and CR/control/space passes are JVM
    literal/regex projections; NFC composition — no Spark built-in exists
    — is one Arrow-batched ``mapInPandas`` pass (vectorized
    ``Series.str.normalize``). The oracle replays the exact chain with
    DuckDB ``replace`` + ``regexp_replace(..., 'g')`` + ``nfc_normalize``,
    so the two engines' replace semantics AND Unicode tables are checked
    against each other byte-for-byte."""
    from ocr_project_spark.textops import normalize_text

    messy = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            "text",
            # cp1252 mojibake: donâ€™t → don’t, â€œokâ€(9d) → “ok”,
            # cafÃ© → café, â€” → em dash
            F.lit(
                " don\u00e2\u20ac\u2122t \u00e2\u20ac\u0153ok"
                "\u00e2\u20ac\x9d caf\u00c3\u00a9 \u00e2\u20ac\u201d"
            ),
            # decomposed i+U+0308 / e+U+0301 (NFC must compose),
            # precomposed é (NFC identity), BEL (stripped), NBSP (→ space)
            F.lit("\r\nnai\u0308ve  caf\u00e9 e\u0301tude\x07\u00a0fin"),
        ).alias("text"),
    )
    return normalize_text(messy, fix_mojibake=True)


def q_corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus mixing toward token proportions en:zh:de =
    5:2:2 (es/fr dropped): the limiting source (de at this sf) is kept in
    full and the others are thinned by an md5-draw that is a pure function
    of the id. The keep rule is exact integer cross-multiplication
    (DECIMAL(38,0) in Spark, HUGEINT in the oracle) — no float thresholds
    — so the kept set is replayed row-exactly."""
    from ocr_project_spark.textops import sample_corpus_mix

    return sample_corpus_mix(_docs(spark, sf_dir), {"en": 5, "zh": 2, "de": 2})


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ocr_project_spark.textops import lang_id

    pages = _pages(spark, sf_dir).where("doc_id % 97 <> 13")
    return lang_id(pages)


def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (the published 13-gram-overlap rule): the
    eval set is the 20-word prefix of every 13th document (doc_id % 13 = 5)
    — a pure SQL derivation, so each planted benchmark row contaminates
    exactly its source document and nothing else. Emits the per-doc
    contaminated-gram count from contamination_check plus a `kept` flag
    taken from the REAL decontaminate anti-join, which the oracle
    cross-checks against NOT contaminated."""
    from ocr_project_spark.textops import contamination_check, decontaminate

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    eval_docs = docs.where("doc_id % 13 = 5").select(
        F.concat_ws(" ", F.slice(F.split("text", " "), 1, 20)).alias("bench_text")
    )
    chk = contamination_check(docs, eval_docs, n=13, eval_text_col="bench_text")
    kept = decontaminate(docs, eval_docs, n=13, eval_text_col="bench_text").select(
        "doc_id", F.lit(True).alias("kept")
    )
    return chk.join(kept, "doc_id", "left").select(
        "doc_id",
        "n_contaminated_grams",
        "contaminated",
        F.coalesce("kept", F.lit(False)).alias("kept"),
    )


def q_dedup_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-level corpus dedup (CCNet/RefinedWeb paragraph rule) over a
    planted multi-line corpus built in pure SQL (documents.text itself is
    single-line): a boilerplate header shared by ALL docs, a footer shared
    by each doc_id % 7 cohort, the doc's own (unique) text, and a unique
    tail. Header+footer must vanish, the two unique lines must survive in
    order — the oracle replays inventory and byte-exact line surgery."""
    from ocr_project_spark.dedup import remove_repeated_lines

    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.lit("Cookie notice: this site uses tracking cookies"),
            F.col("text"),
            F.concat(F.lit("Mirror footer "), (F.col("doc_id") % 7).cast("string")),
            F.concat(F.lit("unique-tail-"), F.col("doc_id").cast("string")),
        ).alias("text"),
    )
    return remove_repeated_lines(docs)


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing over a planted corpus (a pure SQL suffix appends one
    email, one IPv4, and one NANP phone per document) — the oracle replays
    the same sequential regexp_replace chain and per-pattern counts; the
    patterns are restricted to constructs where Java regex and RE2 agree."""
    from ocr_project_spark.textops import redact_pii

    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" Contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com from 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".7 or call 555-"),
            F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
            F.lit("-1234."),
        ).alias("text"),
    )
    return redact_pii(docs)


def q_c4_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 heuristic cleaning (Raffel et al.) over a planted multi-line
    corpus built in pure SQL: the doc's own prose, nav chrome with no
    terminal punctuation (dropped), a 1-word line (dropped), a surviving
    parametrized sentence, and cohort-planted lorem-ipsum (doc_id % 11 == 3),
    curly-brace code (doc_id % 13 == 4), and blocked-word (doc_id % 17 == 5
    — C4's bad-words page filter) lines that flag the whole document. The
    oracle replays line split, the word-count + terminal-punctuation
    lambda, the rebuild, and every document flag including the
    word-boundary blocklist match."""
    from ocr_project_spark.textops import c4_line_filter

    d = F.col("doc_id")
    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.col("text"),
            F.lit("Home | About | Contact"),
            F.lit("Ok."),
            F.concat(
                F.lit("Quality sentence number "),
                (d % 100).cast("string"),
                F.lit(" has plenty of words."),
            ),
            F.when(
                d % 11 == 3, F.lit("Lorem ipsum dolor sit amet, consectetur.")
            ).otherwise(F.lit('Another "quoted" line with enough words here!')),
            F.when(
                d % 13 == 4, F.lit("function f() { return 1; }")
            ).otherwise(F.lit("Closing sentence with sufficient words present?")),
            F.when(
                d % 17 == 5, F.lit("Win the casino jackpot tonight, friends!")
            ).otherwise(F.lit("A perfectly ordinary final sentence sits here.")),
        ).alias("text"),
    )
    return c4_line_filter(docs)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_flagship_rollup(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Registry ordered most-recently-changed first (the round-3 verdict:
    the driver records the first 50 rows, so anything that could fall off a
    window must be a long-stable query, never one that changed this round)
    and consolidated to ≤50 entries by merging operator pairs that
    naturally compose (profile joins), without dropping any operator from
    coverage."""
    return {
        # --- changed or added this round / round 3 tail ---
        "streaming_near_dup": q_streaming_near_dup,
        "text_quality": q_text_quality,
        "recrawl_ops": q_recrawl_ops,
        "warc_sinks": q_warc_sinks,
        "link_graph": q_link_graph,
        "media_codecs": q_media_codecs,
        "c4_clean": q_c4_clean,
        "text_normalize": q_text_normalize,
        "sim_topk": q_sim_topk,
        "dsir_select": q_dsir_select,
        "bloom_seen": q_bloom_seen,
        "url_canonical": q_url_canonical,
        "diversity_prune": q_diversity_prune,
        "media_video": q_media_video,
        "nb_classify": q_nb_classify,
        "dedup_minhash": q_dedup_minhash,
        "semdedup": q_semdedup,
        "quality_lm": q_quality_lm,
        "sim_embed_dedup": q_sim_embed_dedup,
        "dedup_blocking": q_dedup_blocking,
        "corpus_mix": q_corpus_mix,
        "corpus_partitioning": q_corpus_partitioning,
        "dedup_minhash_components": q_dedup_minhash_components,
        "pii_redact": q_pii_redact,
        "dedup_lines": q_dedup_lines,
        "contamination": q_contamination,
        "backend_listing": q_backend_listing,
        "lang_id": q_lang_id,
        "doc_fingerprints": q_doc_fingerprints,
        "corpus_profile": q_corpus_profile,
        "host_profile": q_host_profile,
        "host_crawl_plan": q_host_crawl_plan,
        # --- byte-identity core ---
        "flagship_rollup": q_flagship_rollup,
        "extract_text_identity": q_extract_text_identity,
        "extract_errors": q_extract_errors,
        "page_rollup": q_page_rollup,
        "span_boxes": q_span_boxes,
        "markdown_identity": q_markdown_identity,
        "raw_output_identity": q_raw_output_identity,
        "unified_fields": q_unified_fields,
        "prompt_modes": q_prompt_modes,
        "locate_spans": q_locate_spans,
        "warc_extract": q_warc_extract,
        "page_selection": q_page_selection,
        "backend_compare": q_backend_compare,
        # --- dedup families ---
        "dedup_repeated_ngrams": q_dedup_repeated_ngrams,
        "dedup_span_removal": q_dedup_span_removal,
        "dedup_simhash": q_dedup_simhash,
        # --- multimodal ---
        "media_features": q_media_features,
        "media_audio": q_media_audio,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "flagship_rollup": f"""
            SELECT lang, {_BACKEND} AS backend,
                   count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS n_bytes
            FROM documents WHERE {_WELL_FORMED}
            GROUP BY 1, 2
        """,
        "extract_text_identity": f"""
            SELECT doc_id, text FROM documents WHERE {_WELL_FORMED}
        """,
        "extract_errors": f"""
            SELECT doc_id, {_BACKEND} AS backend, 'image' AS file_type,
                   'OCR processing failed: ' || err AS markdown, err AS error
            FROM (
                SELECT doc_id,
                       CASE WHEN doc_id % 2 = 0
                            THEN 'no text blocks detected in document'
                            ELSE 'invalid PAGEDOC payload: truncated layout tree'
                       END AS err
                FROM documents WHERE {_MALFORMED}
            )
        """,
        "page_rollup": f"""
            SELECT doc_id, page_count,
                   CASE WHEN page_count > 1 THEN 'pdf' ELSE 'image' END AS file_type,
                   page_count AS n_processed
            FROM (
                SELECT doc_id, {_N_PAGES} AS page_count
                FROM documents WHERE {_WELL_FORMED}
            )
        """,
        "span_boxes": f"""
            WITH d AS (
                SELECT doc_id, string_split(text, ' ') AS words,
                       {_N_PARAS} AS n_paras, {_N_PAGES} AS n_pages
                FROM documents
                WHERE {_WELL_FORMED} AND doc_id % 2 = 0
            ),
            s AS (
                SELECT doc_id, words, n_paras, n_pages,
                       unnest(generate_series(0, n_paras - 1)) AS j
                FROM d
            ),
            -- paragraph j (0-based) lands on page p with in-page block
            -- index idx, replaying datagen.page_slices' floor divisions
            b AS (
                SELECT doc_id, words, j,
                       ((j + 1) * n_pages - 1) // n_paras AS p,
                       n_paras, n_pages
                FROM s
            ),
            i AS (
                SELECT doc_id, words, j,
                       j - (p * n_paras) // n_pages AS idx
                FROM b
            )
            SELECT doc_id,
                   array_to_string(list_slice(words, j * 8 + 1, j * 8 + 8), ' ') AS ref,
                   CAST(40 AS BIGINT) AS x1,
                   CAST(least(40 + idx * 60, 930) AS BIGINT) AS y1,
                   CAST(959 AS BIGINT) AS x2,
                   CAST(least(least(40 + idx * 60, 930) + 50, 980) AS BIGINT) AS y2
            FROM i
        """,
        "markdown_identity": f"""
            WITH d AS (
                SELECT doc_id, string_split(text, ' ') AS words,
                       {_N_PARAS} AS n_paras, {_N_PAGES} AS n_pages
                FROM documents WHERE {_WELL_FORMED}
            )
            SELECT doc_id, {_MD_CASE} AS markdown
            FROM d
        """,
        "unified_fields": f"""
            WITH d AS (
                SELECT doc_id, string_split(text, ' ') AS words,
                       {_N_PARAS} AS n_paras, {_N_PAGES} AS n_pages
                FROM documents
            )
            SELECT doc_id,
                   'doc' || doc_id
                       || CASE WHEN n_pages > 1 THEN '.pdf' ELSE '.html' END
                       AS file_name,
                   CASE WHEN {_MALFORMED}
                        THEN 'OCR processing failed: ' || {_ERR_STR}
                        ELSE {_MD_CASE}
                   END AS source_markdown
            FROM d
        """,
        "prompt_modes": f"""
            WITH d AS (
                SELECT doc_id, text, string_split(text, ' ') AS words,
                       {_N_PARAS} AS n_paras, {_N_PAGES} AS n_pages
                FROM documents WHERE {_WELL_FORMED} AND doc_id % 2 = 0
            )
            SELECT doc_id,
                   CASE WHEN doc_id % 3 = 0 THEN
                       -- grounding template → marker surfaces
                       CASE WHEN n_pages = 1 THEN {_MD_PARA_JOIN}
                            ELSE {_MD_HTML_PDF} END
                   ELSE
                       -- 'Free OCR.' and any other non-grounding prompt:
                       -- no markers; the P2 projection degrades to the
                       -- sentinel on the image path
                       CASE WHEN n_pages = 1
                            THEN 'No text extracted from OCR output'
                            ELSE {_MD_FREE_PDF} END
                   END AS markdown,
                   text
            FROM d
        """,
        "raw_output_identity": f"""
            WITH d AS (
                SELECT doc_id, string_split(text, ' ') AS words,
                       {_N_PARAS} AS n_paras, {_N_PAGES} AS n_pages
                FROM documents WHERE {_WELL_FORMED}
            )
            SELECT doc_id,
              CASE WHEN doc_id % 2 = 1 THEN
                '{{"middle_json": {{"pdf_info": ['
                || array_to_string(
                     list_transform(generate_series(1, n_pages), p ->
                       '{{"page": ' || p || ', "n_blocks": '
                       || (p*n_paras//n_pages - (p-1)*n_paras//n_pages) || '}}'
                     ), ', ')
                || ']}}, "metadata": {{"language": "ch", "ocr_enabled": true, '
                || '"formula_enabled": true, "table_enabled": true}}}}'
              ELSE
                array_to_string(
                  list_transform(generate_series(1, n_paras), jj ->
                    '<|ref|>'
                    || array_to_string(list_slice(words, (jj-1)*8+1, (jj-1)*8+8), ' ')
                    || '<|/ref|><|det|>[[40, ' || least(40 + (jj-1)*60, 930)
                    || ', 959, ' || least(least(40 + (jj-1)*60, 930) + 50, 980)
                    || ']]<|/det|>'
                  ), chr(10))
              END AS raw_output
            FROM d
            WHERE doc_id % 2 = 1 OR n_pages = 1
        """,
        "locate_spans": f"""
            WITH d AS (
                SELECT doc_id, string_split(text, ' ') AS words,
                       {_N_PARAS} AS n_paras, {_N_PAGES} AS n_pages
                FROM documents
                WHERE {_WELL_FORMED} AND doc_id % 2 = 0
            ),
            s AS (
                SELECT doc_id, words, n_paras, n_pages,
                       unnest(generate_series(0, n_paras - 1)) AS j
                FROM d
            ),
            b AS (
                SELECT doc_id, words, j,
                       ((j + 1) * n_pages - 1) // n_paras AS p,
                       n_paras, n_pages
                FROM s
            ),
            i AS (
                SELECT doc_id, words, j,
                       j - (p * n_paras) // n_pages AS idx
                FROM b
            )
            SELECT doc_id,
                   array_to_string(list_slice(words, j * 8 + 1, j * 8 + 8), ' ')
                       AS ref,
                   CAST(40 AS BIGINT) AS x1,
                   CAST(least(40 + idx * 60, 930) AS BIGINT) AS y1,
                   CAST(959 AS BIGINT) AS x2,
                   CAST(least(least(40 + idx * 60, 930) + 50, 980) AS BIGINT)
                       AS y2
            FROM i
            WHERE array_to_string(list_slice(words, j * 8 + 1, j * 8 + 8), ' ')
                  = array_to_string(list_slice(words, 1, 8), ' ')
        """,
        "backend_listing": f"""
            WITH {_LINEAGE_CTE}
            SELECT backend,
                   CASE WHEN backend = 'deepseek-ocr'
                        THEN 'DeepSeek-OCR-analog lifecycle (reference: deepseek_ocr_backend.py).'
                        ELSE 'MinerU-analog lifecycle (reference: mineru_backend.py).'
                   END AS description,
                   n_docs, n_success, n_failed, n_bytes,
                   {_STATUS_CASE} AS status
            FROM l
        """,
        "host_profile": """
            SELECT CASE WHEN doc_id % 10 < 3 THEN 'popular.example.com'
                        ELSE 'site-' || CAST(doc_id % 40 AS VARCHAR) || '.example.org'
                   END AS host,
                   count(*) AS n_urls,
                   count(*) AS n_urls_check,
                   CAST(min(1735689600 + doc_id) AS BIGINT) AS first_epoch,
                   CAST(max(1735689600 + doc_id) AS BIGINT) AS last_epoch
            FROM documents GROUP BY 1
        """,
        # recrawl_ops: latest rows replay the +1000 s recrawl win; delta
        # rows replay the planted snapshot diff (gone: doc_id % 5 = 0,
        # changed: surviving % 3 = 0, added: '?v=2' variant of % 7 = 1,
        # else unchanged) from pure arithmetic.
        "recrawl_ops": f"""
            WITH u AS (
                SELECT doc_id,
                       'https://'
                       || CASE WHEN doc_id % 10 < 3 THEN 'popular.example.com'
                               ELSE 'site-' || CAST(doc_id % 40 AS VARCHAR)
                                    || '.example.org'
                          END
                       || '/' || source || '/doc' || doc_id
                       || CASE WHEN {_N_PAGES} > 1 THEN '.pdf'
                               ELSE '.html' END AS url
                FROM documents
            )
            SELECT 'latest' AS family, url,
                   1735689600 + doc_id + 1000 AS kept_epoch,
                   'kept' AS status
            FROM u
            UNION ALL
            SELECT 'delta' AS family, url, CAST(-1 AS BIGINT) AS kept_epoch,
                   CASE WHEN doc_id % 5 = 0 THEN 'gone'
                        WHEN doc_id % 3 = 0 THEN 'changed'
                        ELSE 'unchanged' END AS status
            FROM u
            UNION ALL
            SELECT 'delta' AS family, url || '?v=2',
                   CAST(-1 AS BIGINT) AS kept_epoch, 'added' AS status
            FROM u WHERE doc_id % 7 = 1
        """,
        "url_canonical": f"""
            WITH u AS (
                SELECT doc_id,
                       'https://'
                       || CASE WHEN doc_id % 10 < 3 THEN 'popular.example.com'
                               ELSE 'site-' || CAST(doc_id % 40 AS VARCHAR)
                                    || '.example.org'
                          END
                       || '/' || source || '/doc' || doc_id
                       || CASE WHEN {_N_PAGES} > 1 THEN '.pdf' ELSE '.html' END
                           AS url
                FROM documents
            ),
            v AS (
                SELECT doc_id, url,
                       lower(CASE
                           WHEN doc_id % 9 = 4
                               THEN url || '/casino-poker-bonus'
                           WHEN doc_id % 9 = 7
                               THEN 'https://x' || doc_id || '77.xyz/page'
                           ELSE url
                       END) AS su
                FROM u
            ),
            h AS (
                SELECT doc_id, url, su,
                       regexp_extract(su,
                           '^[a-z][a-z0-9+.-]*://([^/:?#]*)', 1) AS host,
                       regexp_replace(regexp_replace(su,
                           '^[a-z][a-z0-9+.-]*://[^/]*', ''),
                           '[?#].*$', '') AS path
                FROM v
            ),
            z AS (
                SELECT doc_id, url,
                       {_SPAM_SUM} AS n_spam_words,
                       regexp_matches(host, '{_SPAM_TLD_RE}') AS bad_tld,
                       CAST(length(host)
                            - length(regexp_replace(host, '[0-9]', '', 'g'))
                            AS BIGINT) AS n_host_digits,
                       CAST(length(host) AS BIGINT) AS host_len,
                       CAST(length(path) - length(replace(path, '/', ''))
                            AS BIGINT) AS path_depth
                FROM h
            )
            SELECT z.doc_id, z.url,
                   CASE WHEN z.doc_id % 10 < 3 THEN 'com,example,popular'
                        ELSE 'org,example,site-'
                             || CAST(z.doc_id % 40 AS VARCHAR)
                   END || ')' || regexp_replace(z.url, '^https://[^/]*', '')
                       AS surt,
                   n_spam_words, bad_tld, n_host_digits,
                   host_len,
                   n_host_digits * 2 > host_len AS digit_heavy_host,
                   path_depth,
                   (n_spam_words > 0) OR bad_tld
                       OR (n_host_digits * 2 > host_len) AS url_suspect
            FROM z
        """,
        # host_crawl_plan: the capped-url rank replay (same url derivation +
        # deterministic (md5(url), url) rank order as the former host_caps
        # oracle) joined with the politeness-budget arithmetic per host
        "host_crawl_plan": f"""
            WITH u AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 10 < 3 THEN 'popular.example.com'
                            ELSE 'site-' || CAST(doc_id % 40 AS VARCHAR)
                                 || '.example.org'
                       END AS host,
                       'https://'
                       || CASE WHEN doc_id % 10 < 3 THEN 'popular.example.com'
                               ELSE 'site-' || CAST(doc_id % 40 AS VARCHAR)
                                    || '.example.org'
                          END
                       || '/' || source || '/doc' || doc_id
                       || CASE WHEN {_N_PAGES} > 1 THEN '.pdf' ELSE '.html' END
                           AS url
                FROM documents
            ),
            r AS (
                SELECT url, host,
                       row_number() OVER (
                           PARTITION BY host ORDER BY md5(url), url
                       ) AS rn
                FROM u
            ),
            s AS (
                SELECT host,
                       count(*) AS n_urls,
                       CAST(max(doc_id) - min(doc_id) AS BIGINT)
                           AS span_seconds
                FROM u GROUP BY 1
            ),
            b AS (
                SELECT host, n_urls,
                       CAST(greatest(1000,
                            CASE WHEN n_urls > 1
                                 THEN floor(span_seconds * 1000 / (n_urls - 1))
                                 ELSE 0 END) AS BIGINT)
                           AS recommended_delay_ms
                FROM s
            )
            SELECT r.url, r.host, b.n_urls, b.recommended_delay_ms
            FROM r JOIN b USING (host) WHERE r.rn <= 5
        """,
        "warc_extract": f"""
            SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0
        """,
        "page_selection": f"""
            SELECT doc_id, page_count,
                   CASE WHEN doc_id % 2 = 0 THEN
                       CASE WHEN page_count >= 3 THEN '1,3' ELSE '1' END
                   ELSE
                       CASE WHEN page_count >= 3 THEN '1,2,3' ELSE '1,2' END
                   END AS processed
            FROM (
                SELECT doc_id, {_N_PAGES} AS page_count
                FROM documents WHERE {_WELL_FORMED}
            )
            WHERE page_count > 1
        """,
        "backend_compare": """
            SELECT doc_id, true AS texts_agree, true AS matches_truth
            FROM documents
        """,
        "dedup_blocking": f"""
            WITH {_DEDUP_CORPUS},
            e AS (
                SELECT 'exact' AS family, md5(text) AS group_key,
                       min(doc_id) AS keeper_id, count(*) AS n_docs
                FROM corpus GROUP BY 2
            ),
            p AS (
                SELECT 'prefix' AS family,
                       array_to_string(
                           list_slice(string_split(text, ' '), 1, 4), ' ')
                           AS group_key,
                       min(doc_id) AS keeper_id, count(*) AS n_docs
                FROM corpus GROUP BY 2 HAVING count(*) > 1
            )
            SELECT * FROM e UNION ALL SELECT * FROM p
        """,

        "dedup_repeated_ngrams": f"""
            WITH {_DEDUP_CORPUS},
            g AS (
                SELECT doc_id,
                       unnest(list_transform(
                           generate_series(1,
                               greatest(len(string_split(text, ' ')) - 7, 1)),
                           i -> array_to_string(
                               list_slice(string_split(text, ' '), i, i + 7),
                               ' ')
                       )) AS gram
                FROM corpus WHERE lang = 'de'
            )
            SELECT gram,
                   CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
                   count(*) AS n_occurrences
            FROM g GROUP BY 1
            HAVING count(DISTINCT doc_id) >= 2
        """,
        # the LSH-verified output equals exact Jaccard at ≥0.8 (candidate
        # recall ≈ 1 - 1e-7 at 128 hashes / 32 bands)
        # both families must produce the identical pair set (LSH recall ≈ 1
        # at these parameters) — asserted by replaying the exact SQL twice
        "dedup_minhash": f"""
            SELECT 'minhash' AS family, * FROM ({_JACCARD_DE_SQL})
            UNION ALL
            SELECT 'exact' AS family, * FROM ({_JACCARD_DE_SQL})
        """,
        # nb_classify: NB training + inference replayed end-to-end in SQL;
        # only the argmax ships, min margin ≈ 11.8 nats on this corpus
        "nb_classify": """
            WITH corpus AS (
                SELECT doc_id, 'clean' AS label_true, text FROM documents
                UNION ALL
                SELECT doc_id + 100000, 'junk',
                       array_to_string(list_transform(range(12),
                           i -> 'gib' || doc_id || '_' || i), ' ')
                FROM documents
            ),
            train AS (
                SELECT label_true AS label, text FROM corpus WHERE doc_id % 2 = 0
            ),
            tok AS (
                SELECT label, unnest(string_split(text, ' ')) AS word FROM train
            ),
            model AS (SELECT label, word, count(*) AS c FROM tok GROUP BY 1, 2),
            vocab AS (SELECT count(DISTINCT word) AS v FROM tok),
            classes AS (
                SELECT p.label, p.n_docs, t.n_tokens,
                       (SELECT v FROM vocab) AS vocab
                FROM (SELECT label, count(*) AS n_docs FROM train GROUP BY 1) p
                JOIN (SELECT label, CAST(sum(c) AS BIGINT) AS n_tokens
                      FROM model GROUP BY 1) t USING (label)
            ),
            ntrain AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n FROM classes),
            dcount AS (
                SELECT doc_id, word, count(*) AS k
                FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                      FROM corpus)
                GROUP BY 1, 2
            ),
            matched AS (
                SELECT d.doc_id, m.label, SUM(d.k * ln(m.c + 1)) AS ms
                FROM dcount d JOIN model m USING (word) GROUP BY 1, 2
            ),
            ndoc AS (
                SELECT doc_id, label_true,
                       len(string_split(text, ' ')) AS n
                FROM corpus
            ),
            scored AS (
                SELECT nd.doc_id, nd.label_true, c.label,
                       ln(c.n_docs * 1.0 / (SELECT n FROM ntrain))
                         + COALESCE(m.ms, 0)
                         - nd.n * ln(c.n_tokens + c.vocab) AS score
                FROM ndoc nd CROSS JOIN classes c
                LEFT JOIN matched m
                  ON m.doc_id = nd.doc_id AND m.label = c.label
            ),
            r AS (
                SELECT doc_id, label_true, label, score,
                       row_number() OVER (PARTITION BY doc_id
                                          ORDER BY score DESC, label ASC) AS rk
                FROM scored
            )
            SELECT doc_id, label_true, label AS pred_label,
                   (label_true = label) AS correct
            FROM r WHERE rk = 1
        """,
        # byte-exact replay of remove_repeated_spans: same full-8-gram
        # inventory (parallel unnest zips starts with grams), same covered
        # positions, same ordered single-space rejoin
        "dedup_span_removal": f"""
            WITH {_DEDUP_CORPUS},
            corp AS (SELECT doc_id, text FROM corpus WHERE lang = 'de'),
            w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM corp),
            g AS (
                SELECT doc_id,
                       unnest(range(greatest(len(ws) - 7, 0))) AS start,
                       unnest(list_transform(
                           range(greatest(len(ws) - 7, 0)),
                           i -> array_to_string(list_slice(ws, i + 1, i + 8), ' ')
                       )) AS gram
                FROM w
            ),
            rep AS (
                SELECT gram FROM g GROUP BY gram
                HAVING count(DISTINCT doc_id) >= 2
            ),
            cov AS (
                SELECT DISTINCT g.doc_id, g.start + o.off AS pos
                FROM g JOIN rep USING (gram), generate_series(0, 7) o(off)
            ),
            pw AS (
                SELECT doc_id, unnest(range(len(ws))) AS pos,
                       unnest(ws) AS word
                FROM w
            ),
            kept AS (
                SELECT pw.doc_id, pw.pos, pw.word
                FROM pw LEFT JOIN cov
                  ON pw.doc_id = cov.doc_id AND pw.pos = cov.pos
                WHERE cov.doc_id IS NULL
            ),
            rebuilt AS (
                SELECT doc_id, string_agg(word, ' ' ORDER BY pos) AS text
                FROM kept GROUP BY doc_id
            ),
            nrem AS (SELECT doc_id, count(*) AS n_removed FROM cov GROUP BY doc_id)
            SELECT c.doc_id, COALESCE(r.text, '') AS text,
                   CAST(COALESCE(nr.n_removed, 0) AS BIGINT) AS n_removed
            FROM corp c
            LEFT JOIN rebuilt r USING (doc_id)
            LEFT JOIN nrem nr USING (doc_id)
        """,
        "dedup_minhash_components": _MINHASH_COMPONENTS_SQL,
        # planted-copy projection: identical text ⇒ identical simhash ⇒
        # pair guaranteed at hamming 0 (see q_dedup_simhash docstring)
        "dedup_simhash": """
            SELECT doc_id AS id_a, doc_id + 100000 AS id_b,
                   CAST(0 AS BIGINT) AS hamming
            FROM documents WHERE lang = 'de'
        """,
        # sim_topk: 'brute' recomputed cosine-by-cosine in DuckDB; the three
        # approximate families over the planted-copy corpus where each
        # query's top-2 are its two exact copies (guaranteed bucket / cell /
        # PQ-code co-location at cosine 1.0; tie → id asc)
        "sim_topk": """
            WITH q AS (
                SELECT vec_id AS query_id, embedding::DOUBLE[] AS vq
                FROM embeddings WHERE vec_id < 10
            ),
            c AS (
                SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS vn
                FROM embeddings
            ),
            s AS (
                SELECT query_id, neighbor_id,
                       list_dot_product(vq, vn)
                           / (sqrt(list_dot_product(vq, vq))
                              * sqrt(list_dot_product(vn, vn))) AS cosine
                FROM q, c WHERE query_id <> neighbor_id
            ),
            brute AS (
                SELECT query_id, rank, neighbor_id FROM (
                    SELECT query_id, neighbor_id,
                           row_number() OVER (
                               PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id ASC) AS rank
                    FROM s
                ) WHERE rank <= 5
            ),
            planted AS (
                SELECT vec_id AS query_id, CAST(1 AS BIGINT) AS rank,
                       vec_id + 100000 AS neighbor_id
                FROM embeddings WHERE vec_id < 10
                UNION ALL
                SELECT vec_id, CAST(2 AS BIGINT), vec_id + 200000
                FROM embeddings WHERE vec_id < 10
            )
            SELECT 'brute' AS family, query_id, rank, neighbor_id FROM brute
            UNION ALL
            SELECT 'lsh', query_id, rank, neighbor_id FROM planted
            UNION ALL
            SELECT 'ivf', query_id, rank, neighbor_id FROM planted
            UNION ALL
            SELECT 'ivfpq', query_id, rank, neighbor_id FROM planted
        """,
        # pair rows: DuckDB recomputes every cosine (cross-engine float
        # check); keep rows: each planted copy has a lower-id near-dup at
        # cosine ≈ 1 → kept set = the originals, exactly. Sentinel -1s on
        # keep rows, never NULLs (pandas NULL-int → NaN degradation).
        "sim_embed_dedup": """
            WITH corpus AS (
                SELECT vec_id, embedding FROM embeddings
                UNION ALL
                SELECT vec_id + 100000, embedding FROM embeddings
            ),
            s AS (
                SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                       list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
                           / (sqrt(list_dot_product(a.embedding::DOUBLE[],
                                                    a.embedding::DOUBLE[]))
                              * sqrt(list_dot_product(b.embedding::DOUBLE[],
                                                      b.embedding::DOUBLE[])))
                           AS cosine
                FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
            )
            SELECT 'pair' AS kind, id_a, id_b, round(cosine, 6) AS cosine
            FROM s WHERE cosine >= 0.95
            UNION ALL
            SELECT 'keep' AS kind, vec_id AS id_a,
                   CAST(-1 AS BIGINT) AS id_b, CAST(-1.0 AS DOUBLE) AS cosine
            FROM embeddings
        """,
        # every vector's one semantic dup is its exact copy (same k-means
        # cell guaranteed; natural cosine ceiling ~0.51 < 0.95 threshold)
        "semdedup": """
            WITH corpus AS (
                SELECT vec_id FROM embeddings
                UNION ALL
                SELECT vec_id + 100000 FROM embeddings
            )
            SELECT vec_id, CAST(1 AS BIGINT) AS n_sem_dups,
                   CAST(1.0 AS DOUBLE) AS max_dup_cosine,
                   (vec_id < 100000) AS kept
            FROM corpus
        """,
        # merged video row set: kind='sampled' replays the fake decode at
        # the byte level (frame ids = sha256(payload || ascii suffix));
        # kind='y4m' predicts the REAL container decode's per-frame sums
        "media_video": """
            WITH m AS (
                SELECT doc_id AS media_id, text,
                       500 + 700 * (doc_id % 5) AS duration_ms
                FROM documents
            ),
            f AS (
                SELECT media_id, text,
                       unnest(generate_series(
                           0, greatest(duration_ms // 1000, 1) - 1
                       )) AS frame_idx
                FROM m
            ),
            ids AS (
                SELECT doc_id AS media_id,
                       8 + doc_id % 24 AS w,
                       6 + (doc_id // 5) % 18 AS h,
                       2 + doc_id % 4 AS nf
                FROM documents
            ),
            xs AS (SELECT g AS x FROM generate_series(0, 31) q(g)),
            ys AS (SELECT g AS y FROM generate_series(0, 23) q(g)),
            ts AS (SELECT g AS t FROM generate_series(0, 5) q(g)),
            sums AS (
                SELECT i.media_id, ts.t,
                       SUM((i.media_id + x + 2 * y + 3 * ts.t) % 256) AS s
                FROM ids i, xs, ys, ts
                WHERE xs.x < i.w AND ys.y < i.h AND ts.t < i.nf
                GROUP BY i.media_id, ts.t
            )
            SELECT 'sampled' AS kind, media_id,
                   CAST(frame_idx AS BIGINT) AS frame_idx,
                   sha256(text || '#frame-' || frame_idx) AS frame_sha256,
                   CAST(-1 AS BIGINT) AS width, CAST(-1 AS BIGINT) AS height,
                   CAST(-1 AS BIGINT) AS luma_sum
            FROM f
            UNION ALL
            SELECT 'y4m', i.media_id, CAST(s.t AS BIGINT), '',
                   CAST(i.w AS BIGINT), CAST(i.h AS BIGINT), CAST(s.s AS BIGINT)
            FROM ids i JOIN sums s USING (media_id)
        """,
        # diversity_prune: full SQL replay — basis-centroid dots are raw
        # coordinates (exact in both engines), ranking on the rounded
        # prototypicality with vec_id tiebreak, integer-ratio drop rule
        "diversity_prune": """
            WITH cent AS (
                SELECT * FROM (VALUES (0, 1), (1, 2), (2, 3), (3, 4)) t(cell, idx)
            ),
            dots AS (
                SELECT e.vec_id, c.cell,
                       CAST(e.embedding[c.idx] AS DOUBLE) AS dot,
                       sqrt(list_dot_product(e.embedding::DOUBLE[],
                                             e.embedding::DOUBLE[])) AS nrm
                FROM embeddings e CROSS JOIN cent c
            ),
            assign AS (
                SELECT vec_id, cell, dot, nrm,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY dot DESC, cell ASC) AS rk
                FROM dots
            ),
            a AS (
                SELECT vec_id, cell, round(dot / nrm, 6) AS prototypicality
                FROM assign WHERE rk = 1
            ),
            r AS (
                SELECT vec_id, cell, prototypicality,
                       row_number() OVER (PARTITION BY cell
                                          ORDER BY prototypicality DESC,
                                                   vec_id ASC) AS rk,
                       count(*) OVER (PARTITION BY cell) AS n
                FROM a
            )
            SELECT vec_id, CAST(cell AS BIGINT) AS cell, prototypicality,
                   (rk * 4 > n * 1) AS kept
            FROM r
        """,
        # fake audio features: every number derives from sha256 digest
        # byte ranges, replayed here from the hex nibbles
        # media_jpeg: the engine Huffman-decodes + dequantizes + IDCTs real
        # baseline JPEG bytes; block-constant grayscale with DC quantizer 8
        # makes the decode exact, so the oracle predicts the sums from the
        # planted block formula (w ≤ 56 → bx ≤ 6, h ≤ 48 → by ≤ 5; each
        # block contributes 64·v, grayscale replicates ×3 channels)
        # link_graph: the engine harvests real <a href> bytes from the html
        # payloads; the oracle rebuilds the identical host graph from
        # doc_id arithmetic (outlinks target doc_id + 7·i, hosts are pure
        # functions of the id — datagen.build_html) and replays degree
        # aggregation plus all three PageRank power iterations in SQL.
        # Micro-rank integers keep the float comparison 9 orders above
        # cross-engine summation noise.
        "link_graph": """
            WITH l AS (
                SELECT doc_id AS s, doc_id + 7 * i.i AS t
                FROM documents, (VALUES (1), (2), (3)) i(i)
                WHERE doc_id % 2 = 0 AND doc_id % 97 <> 13
            ),
            e AS (
                SELECT CASE WHEN s % 10 < 3 THEN 'popular.example.com'
                            ELSE 'site-' || CAST(s % 40 AS VARCHAR)
                                 || '.example.org' END AS src_host,
                       CASE WHEN t % 10 < 3 THEN 'popular.example.com'
                            ELSE 'site-' || CAST(t % 40 AS VARCHAR)
                                 || '.example.org' END AS dst_host,
                       count(*) AS n_links
                FROM l GROUP BY 1, 2
            ),
            nodes AS (
                SELECT src_host AS host FROM e
                UNION
                SELECT dst_host FROM e
            ),
            nn AS (SELECT count(*) AS n FROM nodes),
            ow AS (SELECT src_host, SUM(n_links) AS w FROM e GROUP BY 1),
            deg AS (
                SELECT n.host,
                       COALESCE(o.out_degree, 0) AS out_degree,
                       COALESCE(i.in_degree, 0) AS in_degree,
                       COALESCE(o.n_outlinks, 0) AS n_outlinks,
                       COALESCE(i.n_inlinks, 0) AS n_inlinks
                FROM nodes n
                LEFT JOIN (
                    SELECT src_host, count(*) AS out_degree,
                           SUM(n_links) AS n_outlinks
                    FROM e GROUP BY 1
                ) o ON o.src_host = n.host
                LEFT JOIN (
                    SELECT dst_host, count(*) AS in_degree,
                           SUM(n_links) AS n_inlinks
                    FROM e GROUP BY 1
                ) i ON i.dst_host = n.host
            ),
            r0 AS (
                SELECT host, 1.0 / (SELECT n FROM nn) AS rank FROM nodes
            ),
            d0 AS (
                SELECT COALESCE(SUM(rank), 0) AS dm FROM r0
                WHERE host NOT IN (SELECT src_host FROM ow)
            ),
            r1 AS (
                SELECT n.host,
                       0.15 / (SELECT n FROM nn)
                       + 0.85 * (COALESCE(c.contrib, 0)
                                 + (SELECT dm FROM d0) / (SELECT n FROM nn))
                           AS rank
                FROM nodes n
                LEFT JOIN (
                    SELECT e.dst_host,
                           SUM(r.rank * (e.n_links / CAST(ow.w AS DOUBLE)))
                               AS contrib
                    FROM e
                    JOIN ow ON ow.src_host = e.src_host
                    JOIN r0 r ON r.host = e.src_host
                    GROUP BY 1
                ) c ON c.dst_host = n.host
            ),
            d1 AS (
                SELECT COALESCE(SUM(rank), 0) AS dm FROM r1
                WHERE host NOT IN (SELECT src_host FROM ow)
            ),
            r2 AS (
                SELECT n.host,
                       0.15 / (SELECT n FROM nn)
                       + 0.85 * (COALESCE(c.contrib, 0)
                                 + (SELECT dm FROM d1) / (SELECT n FROM nn))
                           AS rank
                FROM nodes n
                LEFT JOIN (
                    SELECT e.dst_host,
                           SUM(r.rank * (e.n_links / CAST(ow.w AS DOUBLE)))
                               AS contrib
                    FROM e
                    JOIN ow ON ow.src_host = e.src_host
                    JOIN r1 r ON r.host = e.src_host
                    GROUP BY 1
                ) c ON c.dst_host = n.host
            ),
            d2 AS (
                SELECT COALESCE(SUM(rank), 0) AS dm FROM r2
                WHERE host NOT IN (SELECT src_host FROM ow)
            ),
            r3 AS (
                SELECT n.host,
                       0.15 / (SELECT n FROM nn)
                       + 0.85 * (COALESCE(c.contrib, 0)
                                 + (SELECT dm FROM d2) / (SELECT n FROM nn))
                           AS rank
                FROM nodes n
                LEFT JOIN (
                    SELECT e.dst_host,
                           SUM(r.rank * (e.n_links / CAST(ow.w AS DOUBLE)))
                               AS contrib
                    FROM e
                    JOIN ow ON ow.src_host = e.src_host
                    JOIN r2 r ON r.host = e.src_host
                    GROUP BY 1
                ) c ON c.dst_host = n.host
            )
            SELECT deg.host,
                   CAST(deg.out_degree AS BIGINT) AS out_degree,
                   CAST(deg.in_degree AS BIGINT) AS in_degree,
                   CAST(deg.n_outlinks AS BIGINT) AS n_outlinks,
                   CAST(deg.n_inlinks AS BIGINT) AS n_inlinks,
                   CAST(ROUND(r3.rank * 1e6) AS BIGINT) AS pagerank_micro
            FROM deg JOIN r3 ON r3.host = deg.host
        """,
        # media_codecs (png ∪ jpeg, codec-tagged): the engine decodes real
        # PNG bytes (inflate + unfilter; ids with id % 31 = 7 carry a
        # structurally valid PNG with a truncated IDAT — must surface as
        # `corrupt` rows, never dead batches) and real lossless baseline
        # JPEGs (marker walk + Huffman + dequant + IDCT); the oracle
        # predicts both decodes from the planted-pixel formulas (see
        # multimodal.synthesize_png_media / synthesize_jpeg_media). Static
        # series bounds match the synthesis ranges.
        "media_codecs": """
            WITH jids AS (
                SELECT doc_id AS media_id,
                       16 + 8 * (doc_id % 6) AS w,
                       16 + 8 * ((doc_id // 7) % 5) AS h
                FROM documents
            ),
            bxs AS (SELECT g AS bx FROM generate_series(0, 6) t(g)),
            bys AS (SELECT g AS by FROM generate_series(0, 5) t(g)),
            jsums AS (
                SELECT i.media_id,
                       SUM((i.media_id + 3 * bx + 5 * by) % 256) * 64 AS s
                FROM jids i, bxs, bys
                WHERE bxs.bx < i.w // 8 AND bys.by < i.h // 8
                GROUP BY i.media_id
            ),
            ids AS (
                SELECT doc_id AS media_id,
                       16 + doc_id % 48 AS w,
                       12 + (doc_id // 7) % 36 AS h
                FROM documents
            ),
            xs AS (SELECT g AS x FROM generate_series(0, 63) t(g)),
            ys AS (SELECT g AS y FROM generate_series(0, 47) t(g)),
            sums AS (
                SELECT i.media_id,
                       SUM((i.media_id + x + 2 * y) % 256) AS s1,
                       SUM((i.media_id + x + 2 * y) % 256
                           + (i.media_id + x + 2 * y + 85) % 256
                           + (i.media_id + x + 2 * y + 170) % 256) AS s3
                FROM ids i, xs, ys
                WHERE xs.x < i.w AND ys.y < i.h
                GROUP BY i.media_id
            )
            SELECT i.media_id,
                   CAST(CASE WHEN i.media_id % 31 = 7 THEN 0 ELSE i.w END
                        AS BIGINT) AS width,
                   CAST(CASE WHEN i.media_id % 31 = 7 THEN 0 ELSE i.h END
                        AS BIGINT) AS height,
                   CAST(CASE WHEN i.media_id % 31 = 7 THEN 0
                             WHEN i.media_id % 2 = 0 THEN 3 * s.s1
                             ELSE s.s3 END
                        AS BIGINT) AS pixel_sum,
                   i.media_id % 31 = 7 AS corrupt,
                   'png' AS codec
            FROM ids i JOIN sums s USING (media_id)
            UNION ALL
            SELECT i.media_id,
                   CAST(i.w AS BIGINT) AS width,
                   CAST(i.h AS BIGINT) AS height,
                   CAST(3 * s.s AS BIGINT) AS pixel_sum,
                   FALSE AS corrupt,
                   'jpeg' AS codec
            FROM jids i JOIN jsums s USING (media_id)
        """,
        "media_audio": f"""
            WITH h AS (
                SELECT doc_id AS media_id, sha256(text) AS hx FROM documents
            ),
            v AS (
                SELECT media_id,
                       8000 + ({_hex_int('hx', 1, 4)}) % 40000 AS sample_rate,
                       1000 + ({_hex_int('hx', 5, 6)}) % 100000 AS n_samples,
                       ({_hex_int('hx', 11, 4)}) % 1000 AS rms_x1000,
                       ({_hex_int('hx', 15, 6)}) AS zc_raw
                FROM h
            )
            SELECT media_id,
                   CAST(sample_rate AS BIGINT) AS sample_rate,
                   CAST(n_samples AS BIGINT) AS n_samples,
                   CAST(n_samples * 1000 // sample_rate AS BIGINT)
                       AS duration_ms,
                   CAST(rms_x1000 AS BIGINT) AS rms_x1000,
                   CAST(zc_raw % n_samples AS BIGINT) AS zero_crossings
            FROM v
        """,
        # fake decode dims = 320 + (digest hex nibbles as int) % 1600
        "media_features": f"""
            WITH h AS (
                SELECT doc_id AS media_id, sha256(text) AS hx FROM documents
            )
            SELECT media_id,
                   CAST(320 + ({_hex_int('hx', 1)}) % 1600 AS BIGINT)
                       AS width,
                   CAST(320 + ({_hex_int('hx', 5)}) % 1600 AS BIGINT)
                       AS height,
                   hx AS sha256
            FROM h
        """,
        # text_quality: scores + the gate verdict as a CASE over the same
        # integer-scaled features (quality_scores ∘ quality_gate in one row)
        # + the two token counters (subsumes the round-3 text_token_counts)
        # + the Gopher gate features/verdict and the repetition signals
        # (round-5 merge of the gopher_gate row set; the shared
        # n_words/avg_word_len_x100/stopword_hits come from the scores side)
        "text_quality": r"""
            WITH f AS (
                SELECT doc_id,
                       length(text) AS n_chars,
                       len(string_split(text, ' ')) AS n_words,
                       CAST(floor(length(replace(text, ' ', '')) * 100
                            / len(string_split(text, ' '))) AS BIGINT)
                           AS avg_word_len_x100,
                       len(list_filter(string_split(text, ' '),
                                       w -> w = 'a' OR w = 'the'))
                           AS stopword_hits,
                       CAST(floor(len(list_filter(string_split(text, ' '),
                                                  w -> w = 'a' OR w = 'the'))
                                  * 10000
                            / len(string_split(text, ' '))) AS BIGINT)
                           AS stopword_ratio_x10000,
                       CAST(floor(len(list_filter(string_split(text, ' '),
                                w -> regexp_matches(w, '[a-zA-Z]'))) * 100
                            / len(string_split(text, ' '))) AS BIGINT)
                           AS alpha_word_ratio_x100
                FROM documents
            ),
            w AS (
                SELECT doc_id, string_split(text, ' ') AS ws,
                       len(string_split(text, ' ')) AS n
                FROM documents
            ),
            wc AS (
                SELECT doc_id, word, count(*) AS c
                FROM (SELECT doc_id, unnest(ws) AS word FROM w)
                GROUP BY doc_id, word
            ),
            wstat AS (
                SELECT doc_id, max(c) AS top, count(*) AS n_distinct
                FROM wc GROUP BY doc_id
            ),
            g AS (
                SELECT doc_id,
                       unnest(list_transform(
                           range(greatest(n - 1, 1)),
                           i -> array_to_string(list_slice(ws, i + 1, i + 2), ' ')
                       )) AS gram
                FROM w WHERE n >= 2
            ),
            gc AS (
                SELECT doc_id, gram, count(*) AS c FROM g GROUP BY doc_id, gram
            ),
            dup AS (
                SELECT doc_id,
                       SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS dup_pos
                FROM gc GROUP BY doc_id
            )
            SELECT f.doc_id, f.n_chars, f.n_words, f.avg_word_len_x100,
                   f.stopword_hits, f.stopword_ratio_x10000,
                   f.n_words >= 20
                       AND f.avg_word_len_x100 BETWEEN 200 AND 900
                       AS passes_gate,
                   len(string_split(d.text, ' ')) AS n_ws_tokens,
                   len(regexp_extract_all(d.text,
                       '[a-zA-Z0-9]+|[^a-zA-Z0-9\s]')) AS n_bpe_tokens,
                   f.alpha_word_ratio_x100,
                   (f.n_words BETWEEN 20 AND 100000
                    AND f.avg_word_len_x100 BETWEEN 200 AND 1000
                    AND f.alpha_word_ratio_x100 >= 80
                    AND f.stopword_hits >= 2) AS passes_gopher,
                   CAST(floor(wstat.top * 10000 / w.n) AS BIGINT)
                       AS top_word_frac_x10000,
                   CAST(floor(wstat.n_distinct * 10000 / w.n) AS BIGINT)
                       AS distinct_word_frac_x10000,
                   CAST(floor(COALESCE(dup.dup_pos, 0) * 10000
                              / greatest(w.n - 1, 1)) AS BIGINT)
                       AS dup_2gram_frac_x10000
            FROM f
            JOIN documents d ON f.doc_id = d.doc_id
            JOIN w ON f.doc_id = w.doc_id
            JOIN wstat ON f.doc_id = wstat.doc_id
            LEFT JOIN dup ON f.doc_id = dup.doc_id
        """,
        # streaming_near_dup: the cross-batch incremental LSH index must
        # reproduce the batch closure — the exact all-pairs 3-gram-Jaccard
        # set over the same planted corpus (LSH recall ≈ 1 at 128/32)
        "streaming_near_dup": _JACCARD_DE_SQL,
        # WET round-trip: the parsed-back record set equals ground truth
        # (url derivation identical to url_canonical's)
        # warc_sinks: WET rows are the byte-identity ground truth; WAT rows
        # are the planted link set (even well-formed docs × i ∈ {1,2,3},
        # dst host/url pure doc_id arithmetic) plus one empty-payload row
        # per linkless page (layout-arm and malformed docs).
        "warc_sinks": f"""
            WITH u AS (
                SELECT doc_id, source,
                       'https://'
                       || CASE WHEN doc_id % 10 < 3 THEN 'popular.example.com'
                               ELSE 'site-' || CAST(doc_id % 40 AS VARCHAR)
                                    || '.example.org'
                          END
                       || '/' || source || '/doc' || doc_id
                       || CASE WHEN {_N_PAGES} > 1 THEN '.pdf'
                               ELSE '.html' END AS url,
                       text
                FROM documents
            )
            SELECT 'wet' AS fmt, url, text AS payload
            FROM u WHERE {_WELL_FORMED}
            UNION ALL
            SELECT 'wat' AS fmt, u.url,
                   'https://'
                   || CASE WHEN (doc_id + 7 * i.i) % 10 < 3
                           THEN 'popular.example.com'
                           ELSE 'site-'
                                || CAST((doc_id + 7 * i.i) % 40 AS VARCHAR)
                                || '.example.org'
                      END
                   || '/ref/doc' || (doc_id + 7 * i.i) || '.html' AS payload
            FROM u, (VALUES (1), (2), (3)) i(i)
            WHERE doc_id % 2 = 0 AND {_WELL_FORMED}
            UNION ALL
            SELECT 'wat' AS fmt, url, '' AS payload
            FROM u WHERE doc_id % 2 = 1 OR {_MALFORMED}
        """,
        # hash_split replay (same md5 hex-prefix bucket, same ordered
        # threshold chain) joined with the shard packing replay (the
        # distributed prefix sum must equal one global cumulative window)
        "corpus_partitioning": f"""
            WITH b AS (
                SELECT doc_id,
                       ({_hex_int("md5('split' || CAST(doc_id AS VARCHAR))", 1, 8)})
                           % 10000 AS bucket
                FROM documents
            ),
            t AS (
                SELECT doc_id,
                       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
                FROM documents
            ),
            s AS (
                SELECT doc_id, n_tokens,
                       CAST((sum(n_tokens) OVER (ORDER BY doc_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW)
                             - n_tokens) // 10000 AS BIGINT) AS shard
                FROM t
            )
            SELECT b.doc_id, CAST(bucket AS BIGINT) AS bucket,
                   CASE WHEN bucket < 9800 THEN 'train'
                        WHEN bucket < 9900 THEN 'val'
                        ELSE 'test' END AS split,
                   s.n_tokens, s.shard
            FROM b JOIN s ON b.doc_id = s.doc_id
        """,
        # normalize_text replay: the identical regexp chain (RE2 escapes in
        # plain-literal patterns; 'g' = replace-all like Spark) then
        # DuckDB's nfc_normalize vs the engine's Python unicodedata NFC —
        # a cross-engine check of the Unicode composition tables
        "text_normalize": f"""
            WITH m AS (
                SELECT doc_id,
                       text || {_MOJI_SEG_SQL}
                            || chr(13) || chr(10) || 'nai' || chr(776)
                            || 've  caf' || chr(233) || ' e' || chr(769)
                            || 'tude' || chr(7) || chr(160) || 'fin' AS orig
                FROM documents
            ),
            n AS (
                SELECT doc_id, orig,
                       nfc_normalize(
                           regexp_replace(
                               regexp_replace(
                                   regexp_replace(
                                       regexp_replace({_MOJIBAKE_SQL},
                                                      '\\r\\n|\\r',
                                                      chr(10), 'g'),
                                       chr(160), ' ', 'g'),
                                   '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]',
                                   '', 'g'),
                               '  +', ' ', 'g')) AS text
                FROM m
            )
            SELECT doc_id, text, text <> orig AS changed FROM n
        """,
        # sample_corpus_mix replay: per-source token totals, the argmin
        # limiting source (IEEE double of the same ints in both engines,
        # source-asc tiebreak), then the exact HUGEINT cross-multiplication
        # keep rule — no float thresholds anywhere
        "corpus_mix": f"""
            WITH t AS (
                SELECT doc_id, lang AS source,
                       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
                FROM documents
            ),
            w(source, weight) AS (VALUES ('de', 2), ('en', 5), ('zh', 2)),
            tw AS (
                SELECT t.source, CAST(sum(n_tokens) AS BIGINT) AS total,
                       weight
                FROM t JOIN w ON t.source = w.source
                GROUP BY t.source, weight
            ),
            lim AS (
                SELECT total AS lim_total, weight AS lim_weight FROM tw
                ORDER BY CAST(total AS DOUBLE) / weight ASC, source ASC
                LIMIT 1
            )
            SELECT doc_id, source, n_tokens
            FROM t JOIN tw USING (source), lim
            WHERE CAST(({_hex_int("md5('mix' || CAST(doc_id AS VARCHAR))", 1, 8)})
                       AS HUGEINT)
                      * CAST(total AS HUGEINT) * CAST(lim_weight AS HUGEINT)
                < CAST(4294967296 AS HUGEINT)
                      * CAST(lim_total AS HUGEINT) * CAST(weight AS HUGEINT)
        """,
        # quality_lm: the corpus IS the language model — gram strings are
        # rebuilt here while Spark only ever sees 64-bit gram hashes (a
        # cross-representation check); familiarity is int/int IEEE division
        # in both engines
        # dsir_select: cross-representation replay (gram STRINGS rebuilt in
        # SQL; Spark never materializes them). weight is a fixed tree of
        # IEEE double divisions over exact integers — bit-identical in both
        # engines; the selected gate is integer cross-multiplication
        # (DuckDB promotes to HUGEINT, Spark carries DECIMAL(38,0)).
        "dsir_select": """
            WITH corpus AS (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 100000,
                       array_to_string(list_transform(range(12),
                           i -> 'gib' || doc_id || '_' || i), ' ')
                FROM documents WHERE doc_id % 5 = 0
            ),
            w AS (
                SELECT doc_id, string_split(text, ' ') AS ws,
                       len(string_split(text, ' ')) AS n
                FROM corpus
            ),
            g AS (
                SELECT DISTINCT doc_id, gram FROM (
                    SELECT doc_id,
                           unnest(list_transform(
                               range(greatest(n - 1, 1)),
                               i -> array_to_string(
                                   list_slice(ws, i + 1, i + 2), ' ')
                           )) AS gram
                    FROM w
                )
            ),
            tg AS (
                SELECT doc_id, gram FROM g
                WHERE doc_id < 100000 AND doc_id % 5 = 0
            ),
            rdf AS (SELECT gram, count(*) AS raw_df FROM g GROUP BY 1),
            tdf AS (SELECT gram, count(*) AS target_df FROM tg GROUP BY 1),
            rt AS (SELECT count(*) AS raw_total FROM g),
            tt AS (SELECT count(*) AS target_total FROM tg),
            per AS (
                SELECT doc_id,
                       CAST(count(*) AS BIGINT) AS n_feats,
                       CAST(sum(raw_df) AS BIGINT) AS sum_raw_df,
                       CAST(sum(coalesce(target_df, 0)) AS BIGINT)
                           AS sum_target_df
                FROM g
                JOIN rdf USING (gram)
                LEFT JOIN tdf USING (gram)
                GROUP BY 1
            )
            SELECT doc_id, n_feats, sum_raw_df, sum_target_df,
                   (CAST(sum_target_df AS DOUBLE)
                        / CAST(target_total AS DOUBLE))
                   / (CAST(sum_raw_df AS DOUBLE)
                        / CAST(raw_total AS DOUBLE)) AS weight,
                   sum_target_df * raw_total * 2
                       >= sum_raw_df * target_total * 1 AS selected
            FROM per, rt, tt
        """,
        # bloom_seen: full in-SQL replay of the filter build AND every
        # probe from the identical md5-position arithmetic (15 hex chars →
        # 60-bit int → mod m), 32-bit words, bit_or aggregation
        "bloom_seen": """
            WITH k AS (
                SELECT doc_id, 'k' || doc_id AS key FROM documents
            ),
            i AS (SELECT unnest(generate_series(0, 3)) AS i),
            sp AS (
                SELECT CAST(('0x' || substring(
                           md5('bloom#' || i || '#' || key), 1, 15))
                           AS BIGINT) % 2048 AS pos
                FROM k, i WHERE doc_id % 3 <> 0
            ),
            words AS (
                SELECT pos // 32 AS word_idx,
                       bit_or(CAST(1 AS BIGINT)
                              << CAST(pos % 32 AS INTEGER)) AS bits
                FROM sp GROUP BY 1
            ),
            cp AS (
                SELECT doc_id,
                       CAST(('0x' || substring(
                           md5('bloom#' || i || '#' || key), 1, 15))
                           AS BIGINT) % 2048 AS pos
                FROM k, i
            ),
            j AS (
                SELECT doc_id,
                       CASE WHEN (CAST(1 AS BIGINT)
                                  << CAST(pos % 32 AS INTEGER))
                                 & coalesce(bits, 0) <> 0
                            THEN 1 ELSE 0 END AS hit
                FROM cp LEFT JOIN words ON words.word_idx = pos // 32
            ),
            f AS (
                -- min(hit), duplicate-id-invariant like the Spark side
                SELECT doc_id, min(hit) = 1 AS probably_seen
                FROM j GROUP BY 1
            )
            SELECT doc_id, probably_seen,
                   doc_id % 3 <> 0 AS exact_seen,
                   probably_seen AND NOT (doc_id % 3 <> 0) AS false_positive
            FROM f
        """,
        "quality_lm": """
            WITH corpus AS (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 100000,
                       array_to_string(list_transform(range(12),
                           i -> 'gib' || doc_id || '_' || i), ' ')
                FROM documents WHERE doc_id % 5 = 0
            ),
            w AS (
                SELECT doc_id, string_split(text, ' ') AS ws,
                       len(string_split(text, ' ')) AS n
                FROM corpus
            ),
            g AS (
                SELECT DISTINCT doc_id, gram FROM (
                    SELECT doc_id,
                           unnest(list_transform(
                               range(greatest(n - 1, 1)),
                               i -> array_to_string(
                                   list_slice(ws, i + 1, i + 2), ' ')
                           )) AS gram
                    FROM w
                )
            ),
            df AS (SELECT gram, count(*) AS df FROM g GROUP BY 1),
            per AS (
                SELECT doc_id,
                       CAST(count(*) AS BIGINT) AS n_grams,
                       CAST(SUM(CASE WHEN df <= 1 THEN 1 ELSE 0 END)
                            AS BIGINT) AS n_rare,
                       CAST(SUM(df) AS BIGINT) AS sum_df
                FROM g JOIN df USING (gram) GROUP BY 1
            )
            SELECT doc_id, n_grams, n_rare, sum_df,
                   (n_grams - n_rare) / n_grams AS familiarity,
                   (n_rare * 2 <= n_grams) AS passes_lm
            FROM per
        """,
        # doc_fingerprints: whole-text + min-shingle md5 alongside the
        # winnowing stats; the Horner fold (a·B + c) mod P with
        # first-element init is exactly list_reduce's semantics →
        # bit-for-bit replay
        "doc_fingerprints": """
            WITH c AS (
                SELECT doc_id,
                       md5(text) AS md5_fingerprint,
                       list_min(list_transform(
                           generate_series(1,
                               greatest(len(string_split(text, ' ')) - 3, 1)),
                           i -> md5(array_to_string(
                               list_slice(string_split(text, ' '), i, i + 3),
                               ' '))
                       )) AS shingle_fingerprint,
                       list_transform(string_split_regex(text, ''),
                           ch -> CAST(unicode(ch) AS BIGINT)) AS codes
                FROM documents
            )
            SELECT doc_id, md5_fingerprint, shingle_fingerprint,
                   CAST(greatest(len(codes) - 7, 1) AS BIGINT) AS n_grams,
                   CAST(list_min(list_transform(
                       generate_series(1, greatest(len(codes) - 7, 1)),
                       i -> list_reduce(list_slice(codes, i, i + 7),
                                        (a, ch) -> (a * 257 + ch)
                                                   % 2147483647)
                   )) AS BIGINT) AS min_hash
            FROM c
        """,
        # corpus_profile: exact aggregates + percentiles in one per-lang
        # row. The GK sketch is exact while per-group n ≤ its accuracy
        # bound (10000), and Spark's exact-mode rank convention equals
        # DuckDB's quantile_disc (validated on distinct values at n=7..1000)
        "corpus_profile": """
            SELECT lang, count(*) AS n_docs,
                   CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                       AS total_words,
                   CAST(floor(sum(len(string_split(text, ' '))) * 100
                        / count(*)) AS BIGINT) AS avg_words_x100,
                   CAST(min(len(string_split(text, ' '))) AS BIGINT)
                       AS min_words,
                   CAST(max(len(string_split(text, ' '))) AS BIGINT)
                       AS max_words,
                   CAST(quantile_disc(len(string_split(text, ' ')), 0.5)
                        AS BIGINT) AS p50_words,
                   CAST(quantile_disc(len(string_split(text, ' ')), 0.9)
                        AS BIGINT) AS p90_words,
                   CAST(quantile_disc(len(string_split(text, ' ')), 0.99)
                        AS BIGINT) AS p99_words
            FROM documents GROUP BY 1
        """,
        "lang_id": f"""
            SELECT doc_id, lang AS pred_lang FROM documents WHERE {_WELL_FORMED}
        """,
        # 13-gram benchmark-overlap decontamination: the oracle rebuilds the
        # same eval set (20-word prefix of doc_id % 13 = 5), derives the same
        # distinct word 13-grams on both sides (short docs yield one
        # shorter-than-n gram, exactly like shingle_sets), counts per-doc
        # hits, and cross-checks decontaminate's kept flag = NOT contaminated.
        "contamination": """
            WITH ev AS (
                SELECT DISTINCT unnest(list_distinct(list_transform(
                    generate_series(1,
                        greatest(len(string_split(bench_text, ' ')) - 12, 1)),
                    i -> array_to_string(
                        list_slice(string_split(bench_text, ' '), i, i + 12),
                        ' ')
                ))) AS gram
                FROM (
                    SELECT array_to_string(
                               list_slice(string_split(text, ' '), 1, 20), ' ')
                           AS bench_text
                    FROM documents WHERE doc_id % 13 = 5
                )
            ),
            dg AS (
                SELECT doc_id, unnest(list_distinct(list_transform(
                    generate_series(1,
                        greatest(len(string_split(text, ' ')) - 12, 1)),
                    i -> array_to_string(
                        list_slice(string_split(text, ' '), i, i + 12), ' ')
                ))) AS gram
                FROM documents
            ),
            hits AS (
                SELECT doc_id, count(*) AS n
                FROM dg JOIN ev USING (gram) GROUP BY 1
            )
            SELECT d.doc_id,
                   CAST(coalesce(h.n, 0) AS BIGINT) AS n_contaminated_grams,
                   coalesce(h.n, 0) > 0 AS contaminated,
                   coalesce(h.n, 0) = 0 AS kept
            FROM documents d LEFT JOIN hits h USING (doc_id)
        """,
        # line-level corpus dedup: same repeated-line inventory (lines in
        # ≥2 distinct docs — here the page-separator chrome), same in-order
        # surgery over the split array, newline rejoin. coalesce guards the
        # aggregate-list row when no line repeats.
        "dedup_lines": """
            WITH c AS (
                SELECT doc_id,
                       'Cookie notice: this site uses tracking cookies'
                       || chr(10) || text || chr(10)
                       || 'Mirror footer ' || CAST(doc_id % 7 AS VARCHAR)
                       || chr(10) || 'unique-tail-' || CAST(doc_id AS VARCHAR)
                           AS text
                FROM documents
            ),
            l AS (
                SELECT doc_id, string_split(text, chr(10)) AS ls
                FROM c
            ),
            rep AS (
                SELECT coalesce(list(line), []) AS rl FROM (
                    SELECT line FROM (
                        SELECT doc_id, unnest(ls) AS line FROM l
                    ) GROUP BY line HAVING count(DISTINCT doc_id) >= 2
                )
            )
            SELECT doc_id,
                   array_to_string(
                       list_filter(ls, x -> NOT list_contains(rl, x)),
                       chr(10)) AS text,
                   CAST(len(ls)
                        - len(list_filter(ls, x -> NOT list_contains(rl, x)))
                        AS BIGINT) AS n_removed_lines
            FROM l, rep
        """,
        # C4 cleaning replay: identical planted multi-line corpus, the
        # same line lambda (>=5 words AND terminal-punctuation regex —
        # Java regex and RE2 agree on the anchored class), rebuild, and
        # document flags (lorem-ipsum / brace / >=3 kept lines).
        "c4_clean": r"""
            WITH m AS (
                SELECT doc_id,
                       text || chr(10) || 'Home | About | Contact'
                            || chr(10) || 'Ok.' || chr(10)
                            || 'Quality sentence number '
                            || CAST(doc_id % 100 AS VARCHAR)
                            || ' has plenty of words.' || chr(10)
                            || CASE WHEN doc_id % 11 = 3
                                    THEN 'Lorem ipsum dolor sit amet, consectetur.'
                                    ELSE 'Another "quoted" line with enough words here!'
                               END || chr(10)
                            || CASE WHEN doc_id % 13 = 4
                                    THEN 'function f() { return 1; }'
                                    ELSE 'Closing sentence with sufficient words present?'
                               END || chr(10)
                            || CASE WHEN doc_id % 17 = 5
                                    THEN 'Win the casino jackpot tonight, friends!'
                                    ELSE 'A perfectly ordinary final sentence sits here.'
                               END AS orig
                FROM documents
            ),
            l AS (
                SELECT doc_id, orig,
                       list_filter(string_split(orig, chr(10)),
                                   x -> len(string_split(x, ' ')) >= 5
                                        AND regexp_matches(x, '[.!?"]$'))
                           AS kept_lines,
                       len(string_split(orig, chr(10))) AS nl,
                       regexp_matches(lower(orig),
                           '\b(porn|xxx|viagra|casino|jackpot|escort)\b')
                           AS blocked
                FROM m
            )
            SELECT doc_id,
                   array_to_string(kept_lines, chr(10)) AS text,
                   (NOT contains(lower(orig), 'lorem ipsum'))
                       AND (NOT contains(orig, '{'))
                       AND (NOT blocked)
                       AND len(kept_lines) >= 3 AS kept,
                   blocked,
                   CAST(nl AS BIGINT) AS n_lines,
                   CAST(len(kept_lines) AS BIGINT) AS n_lines_kept
            FROM l
        """,
        # PII redaction: identical planted suffix, identical sequential
        # replace chain (email -> ipv4 -> phone), counts on the original
        # text; 'g' = global replace to match Spark's regexp_replace.
        "pii_redact": r"""
            WITH p AS (
                SELECT doc_id,
                       text || ' Contact user' || CAST(doc_id AS VARCHAR)
                            || '@example.com from 10.0.'
                            || CAST(doc_id % 256 AS VARCHAR)
                            || '.7 or call 555-'
                            || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                            || '-1234.' AS text
                FROM documents
            )
            SELECT doc_id,
                   regexp_replace(
                       regexp_replace(
                           regexp_replace(text,
                               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                               '<EMAIL>', 'g'),
                           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b',
                           '<IP>', 'g'),
                       '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g') AS text,
                   CAST(len(regexp_extract_all(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                       AS BIGINT) AS n_emails,
                   CAST(len(regexp_extract_all(text,
                       '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))
                       AS BIGINT) AS n_ipv4,
                   CAST(len(regexp_extract_all(text,
                       '\b\d{3}-\d{3}-\d{4}\b'))
                       AS BIGINT) AS n_phones
            FROM p
        """,
    }
