"""Round-4 late additions: Bloom seen-sets, DSIR importance weights,
URL spam scoring, IVF-PQ ANN.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.test_plans import n_nodes, plan_of

M_BITS = 1 << 14
K_PROBES = 4


@pytest.fixture(scope="module")
def embeddings(spark):
    from tests import conftest as c

    return spark.read.parquet(f"{c.SF_DIR}/embeddings.parquet").cache()


# ---------------------------------------------------------------- bloom


def _py_positions(key: str, salt: str = "bloom") -> list[int]:
    out = []
    for i in range(K_PROBES):
        h = hashlib.md5(f"{salt}#{i}#{key}".encode()).hexdigest()
        out.append(int(h[:15], 16) % M_BITS)
    return out


def test_bloom_positions_match_reference(spark):
    """The Spark position expression is the md5 arithmetic the oracle
    replays — check against an independent Python computation."""
    from ocr_project_spark.bloomset import _positions

    keys = spark.createDataFrame([("alpha",), ("beta",), ("k#42",)], ["key"])
    rows = keys.select(
        "key", _positions(F.col("key"), K_PROBES, M_BITS, "bloom").alias("p")
    ).collect()
    for r in rows:
        assert list(r["p"]) == _py_positions(r["key"])


def test_bloom_no_false_negatives_and_fp_accounting(spark, documents):
    from ocr_project_spark.bloomset import bloom_build, bloom_probe

    seen = documents.where("doc_id % 3 != 0").select(
        F.concat(F.lit("k"), F.col("doc_id")).alias("key")
    )
    bloom = bloom_build(seen, m_bits=M_BITS, k_probes=K_PROBES)
    flags = bloom_probe(
        documents.select("doc_id", F.concat(F.lit("k"), F.col("doc_id")).alias("key")),
        bloom,
        m_bits=M_BITS,
        k_probes=K_PROBES,
    ).collect()
    by_id = {r["doc_id"]: r["probably_seen"] for r in flags}
    n_fp = 0
    for did, probably in by_id.items():
        if did % 3 != 0:
            assert probably, f"false negative for seen key {did}"
        elif probably:
            n_fp += 1
    # load factor n*k/m ≈ 0.08 ⇒ FP ≈ (1-e^-0.08)^4 ≈ 4e-5: zero at sf0.001
    n_unseen = sum(1 for d in by_id if d % 3 == 0)
    assert n_fp <= max(1, n_unseen // 20)


def test_bloom_merge_equals_joint_build(spark, documents):
    from ocr_project_spark.bloomset import bloom_build, bloom_merge

    a = documents.where("doc_id % 2 = 0").select(F.concat(F.lit("k"), F.col("doc_id")).alias("key"))
    b = documents.where("doc_id % 2 = 1").select(F.concat(F.lit("k"), F.col("doc_id")).alias("key"))
    joint = bloom_build(a.unionByName(b), m_bits=M_BITS)
    merged = bloom_merge(bloom_build(a, m_bits=M_BITS), bloom_build(b, m_bits=M_BITS))
    assert sorted(map(tuple, joint.collect())) == sorted(
        map(tuple, merged.collect())
    )


def test_bloom_dedup_against_drops_only_seen(spark, documents):
    from ocr_project_spark.bloomset import bloom_dedup_against

    seen = documents.where("doc_id % 3 != 0").select(F.concat(F.lit("k"), F.col("doc_id")).alias("key"))
    kept = bloom_dedup_against(
        documents.select("doc_id", F.concat(F.lit("k"), F.col("doc_id")).alias("key")),
        seen,
        m_bits=M_BITS,
    )
    kept_ids = {r["doc_id"] for r in kept.collect()}
    # every kept id is genuinely novel (no false negatives ⇒ no seen id kept)
    assert all(d % 3 == 0 for d in kept_ids)


def test_bloom_probe_plan_broadcasts_filter(spark, documents):
    from ocr_project_spark.bloomset import bloom_build, bloom_probe

    seen = documents.select(F.concat(F.lit("k"), F.col("doc_id")).alias("key"))
    plan = plan_of(
        bloom_probe(
            documents.select("doc_id", F.concat(F.lit("k"), F.col("doc_id")).alias("key")),
            bloom_build(seen, m_bits=M_BITS),
            m_bits=M_BITS,
        )
    )
    assert n_nodes(plan, "BroadcastHashJoin") >= 1
    assert n_nodes(plan, "CartesianProduct") == 0


# ---------------------------------------------------------- importance (DSIR)


@pytest.fixture(scope="module")
def dsir_out(spark, documents):
    from ocr_project_spark.textops import importance_weights

    docs = documents.select("doc_id", "text")
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
    return {
        r["doc_id"]: r
        for r in importance_weights(corpus, target, n=2).collect()
    }


def test_importance_gibberish_scores_zero(dsir_out):
    for did, r in dsir_out.items():
        if did >= 100000:
            assert r["sum_target_df"] == 0
            assert r["weight"] == 0.0
            assert not r["selected"]


def test_importance_target_members_selected(dsir_out):
    # docs IN the target slice share all their grams with the target ⇒
    # weight ≥ raw-share ratio; with theta=1/2 they must pass
    n_target = sum(1 for d in dsir_out if d < 100000 and d % 5 == 0)
    n_sel = sum(
        1
        for d, r in dsir_out.items()
        if d < 100000 and d % 5 == 0 and r["selected"]
    )
    assert n_sel >= 0.9 * n_target


def test_importance_weight_is_ratio_of_sums(dsir_out):
    # spot-check the arithmetic on one natural doc
    r = next(v for k, v in dsir_out.items() if k < 100000)
    raw_total = None  # recompute from the invariant: weight formula fields
    # weight = (sum_t/target_total)/(sum_raw/raw_total); verify monotone
    # consistency instead of totals: weight == 0 iff sum_target_df == 0
    assert (r["weight"] == 0.0) == (r["sum_target_df"] == 0)
    assert r["n_feats"] > 0 and r["sum_raw_df"] >= r["n_feats"]


def test_importance_bucketed_mode_runs(spark, documents):
    from ocr_project_spark.textops import importance_weights

    docs = documents.select("doc_id", "text").limit(50)
    out = importance_weights(docs, docs.limit(10), n=2, n_buckets=64)
    rows = out.collect()
    assert len(rows) == 50
    assert all(r["n_feats"] > 0 for r in rows)


def test_importance_repartition_invariant(spark, documents):
    from ocr_project_spark.textops import importance_weights

    docs = documents.select("doc_id", "text").limit(80)
    tgt = docs.where("doc_id % 5 = 0")
    a = {
        r["doc_id"]: (r["sum_raw_df"], r["sum_target_df"], r["selected"])
        for r in importance_weights(docs, tgt).collect()
    }
    b = {
        r["doc_id"]: (r["sum_raw_df"], r["sum_target_df"], r["selected"])
        for r in importance_weights(docs.repartition(13), tgt.repartition(7)).collect()
    }
    assert a == b


def test_importance_plan_broadcasts_target_side(spark, documents):
    from ocr_project_spark.textops import importance_weights

    docs = documents.select("doc_id", "text")
    plan = plan_of(importance_weights(docs, docs.where("doc_id % 5 = 0")))
    assert n_nodes(plan, "CartesianProduct") == 0
    # target df table + the two totals ride broadcast joins
    assert n_nodes(plan, "BroadcastHashJoin") + n_nodes(
        plan, "BroadcastNestedLoopJoin"
    ) >= 3


# ------------------------------------------------------------- url spam


def test_url_spam_signals(spark):
    from ocr_project_spark.functions.urls import url_spam_scores

    rows = spark.createDataFrame(
        [
            (1, "https://example.com/articles/post.html"),
            (2, "https://best-casino-bonus.example.com/casino/poker.html"),
            (3, "https://x931425.xyz/page"),
            (4, "https://ok.org/a/b/c/d?q=1"),
        ],
        ["doc_id", "url"],
    )
    out = {r["doc_id"]: r for r in url_spam_scores(rows).collect()}
    assert out[1]["n_spam_words"] == 0 and not out[1]["url_suspect"]
    assert out[2]["n_spam_words"] == 3  # casino ×2 + poker
    assert out[2]["url_suspect"]
    assert out[3]["bad_tld"] and out[3]["digit_heavy_host"]
    assert out[3]["url_suspect"]
    assert out[4]["path_depth"] == 4 and not out[4]["url_suspect"]


def test_url_spam_zero_exchange(spark, pages):
    from ocr_project_spark.functions.urls import url_spam_scores

    plan = plan_of(url_spam_scores(pages.select("doc_id", "url")))
    assert n_nodes(plan, "Exchange") == 0


# -------------------------------------------------------------- ivf-pq


def test_ivfpq_planted_copies_rank_first(spark, embeddings):
    from ocr_project_spark.similarity import ivfpq_topk

    emb = embeddings.select("vec_id", "embedding")
    corpus = emb.unionByName(
        emb.select((F.col("vec_id") + 100000).alias("vec_id"), "embedding")
    ).unionByName(
        emb.select((F.col("vec_id") + 200000).alias("vec_id"), "embedding")
    )
    got = ivfpq_topk(
        corpus, emb.where("vec_id < 5"), k=2, n_cells=8, n_probe=3
    ).collect()
    by_q: dict[int, dict[int, int]] = {}
    for r in got:
        by_q.setdefault(r["query_id"], {})[r["rank"]] = r["neighbor_id"]
    for q, ranks in by_q.items():
        assert ranks[1] == q + 100000
        assert ranks[2] == q + 200000
    assert len(by_q) == 5


def test_ivfpq_recall_vs_brute(spark, embeddings):
    from ocr_project_spark.similarity import brute_force_topk, ivfpq_topk

    qs = embeddings.where("vec_id < 10")
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(embeddings, qs, k=5).collect()
    }
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in ivfpq_topk(
            embeddings, qs, k=5, n_cells=8, n_probe=4, m_sub=16, n_codes=32
        ).collect()
    }
    # approximate index: require decent overlap with the exact answer
    assert len(got & truth) >= 0.5 * len(truth)


def test_ivfpq_plan_jvm_adc(spark, embeddings):
    """ADC scoring is JVM joins/aggs: the only Python appears in the two
    narrow encode passes, and the distance-table join broadcasts."""
    from ocr_project_spark.similarity import ivfpq_topk

    emb = embeddings.select("vec_id", "embedding")
    plan = plan_of(ivfpq_topk(emb, emb.where("vec_id < 3"), k=2, n_cells=4))
    assert n_nodes(plan, "CartesianProduct") == 0
    assert n_nodes(plan, "BroadcastHashJoin") >= 2
    # one fused corpus pass (cell + codes) + the tiny query-table pass
    # (evaluated twice: probe cells and distance tables)
    assert n_nodes(plan, "MapInPandas") <= 3


# ------------------------------------------------------------ mojibake


def test_mojibake_repair_pinned_cases(spark):
    from ocr_project_spark.textops import normalize_text

    rows = spark.createDataFrame(
        [
            (1, "donâ€™t stop"),
            (2, "â€œokâ€\x9d then"),
            (3, "cafÃ© naÃ¯ve?"),  # Ã¯ NOT in the table
            (4, "dash â€” here"),
            (5, "clean ascii text"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: (r["text"], r["changed"])
        for r in normalize_text(rows, fix_mojibake=True).collect()
    }
    assert out[1] == ("don’t stop", True)
    assert out[2] == ("“ok” then", True)
    # é repaired; Ã¯ (outside the pinned table) passes through untouched
    assert out[3] == ("café naÃ¯ve?", True)
    assert out[4] == ("dash — here", True)
    assert out[5] == ("clean ascii text", False)


def test_mojibake_off_by_default(spark):
    from ocr_project_spark.textops import normalize_text

    rows = spark.createDataFrame(
        [(1, "donâ€™t")], ["doc_id", "text"]
    )
    out = normalize_text(rows).collect()[0]
    assert out["text"] == "donâ€™t" and not out["changed"]


# ------------------------------------------------- full curation chain


def test_curate_chain_matches_composed_sql_replay(spark, tmp_path):
    """End-to-end differential for the curation CLI: run the real chain
    (line dedup -> C4 -> PII -> quality gate) through jobs/curate.main,
    then replay the ENTIRE composition as one DuckDB query over the same
    input parquet and require the final (doc_id, text) sets to match
    exactly. The per-stage oracles prove each stage alone; this proves
    the stages compose in the CLI's order (each stage sees the previous
    stage's rewritten text, not the original)."""
    import duckdb

    from ocr_project_spark.jobs.curate import main

    nav = "Home | News | Sports | Contact page."
    rows = []
    for i in range(30):
        lines = [
            nav,
            f"Document number {i} tells a unique and rather detailed "
            "story about streaming data pipelines today.",
            f"Another unique closing sentence number {i} rounds out "
            "the document with enough extra words to pass easily.",
            f"Yet another filler sentence number {i} exists to satisfy "
            "the minimum kept lines rule nicely.",
        ]
        cls = i % 5
        # per-doc-unique trigger lines: an identical line planted in every
        # cohort member would repeat across >= 2 docs and be REMOVED by
        # stage 1 (line dedup) before C4 ever saw it — which the first run
        # of this test demonstrated end-to-end
        if cls == 1:  # C4 lorem-ipsum page drop
            lines.append(
                f"Lorem ipsum dolor sit amet number {i}, consectetur."
            )
        elif cls == 2:  # survives; PII redacted
            lines.append(
                f"Contact admin{i}@example.com or 10.0.0.{i} or "
                "555-123-4567 for details immediately."
            )
        elif cls == 3:  # C4 blocked-word page drop
            lines.append(
                f"Win the casino jackpot number {i} tonight, my friends!"
            )
        elif cls == 4:  # passes C4 (3 short lines) but fails quality gate
            lines = [
                f"Doc {i} has five words.",
                f"Doc {i} shows five words.",
                f"Doc {i} holds five words.",
            ]
        rows.append((i, "\n".join(lines)))
    src = str(tmp_path / "docs")
    out = str(tmp_path / "curated")
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.parquet(src)

    main(
        [
            "--documents",
            src,
            "--out",
            out,
            "--drop-repeated-lines",
            "--c4-clean",
            "--redact-pii",
            "--quality-gate",
        ],
        spark=spark,
    )
    got = {
        (r["doc_id"], r["text"])
        for r in spark.read.parquet(out).select("doc_id", "text").collect()
    }

    line_keep = (
        "x -> len(string_split(x, ' ')) >= 5 "
        "AND regexp_matches(x, '[.!?\"]$')"
    )
    want = duckdb.sql(
        rf"""
        WITH src AS (SELECT doc_id, text FROM read_parquet('{src}/*.parquet')),
        lines AS (
            SELECT doc_id, unnest(string_split(text, chr(10))) AS line
            FROM src
        ),
        rep AS (
            SELECT line FROM lines
            GROUP BY line HAVING count(DISTINCT doc_id) >= 2
        ),
        rl AS (SELECT coalesce(list(line), []) AS rls FROM rep),
        s1 AS (  -- remove_repeated_lines
            SELECT doc_id,
                   array_to_string(
                       list_filter(string_split(text, chr(10)),
                                   x -> NOT list_contains(rls, x)),
                       chr(10)) AS text
            FROM src, rl
        ),
        c4 AS (  -- c4_line_filter over the stage-1 text
            SELECT doc_id,
                   array_to_string(
                       list_filter(string_split(text, chr(10)), {line_keep}),
                       chr(10)) AS new_text,
                   (NOT contains(lower(text), 'lorem ipsum'))
                       AND (NOT contains(text, '{{'))
                       AND (NOT regexp_matches(lower(text),
                           '\b(porn|xxx|viagra|casino|jackpot|escort)\b'))
                       AND len(list_filter(string_split(text, chr(10)),
                               {line_keep})) >= 3 AS kept
            FROM s1
        ),
        s2 AS (SELECT doc_id, new_text AS text FROM c4 WHERE kept),
        s3 AS (  -- redact_pii, same sequential replace chain
            SELECT doc_id,
                   regexp_replace(
                       regexp_replace(
                           regexp_replace(text,
                               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{{2,}}',
                               '<EMAIL>', 'g'),
                           '\b\d{{1,3}}\.\d{{1,3}}\.\d{{1,3}}\.\d{{1,3}}\b',
                           '<IP>', 'g'),
                       '\b\d{{3}}-\d{{3}}-\d{{4}}\b', '<PHONE>', 'g') AS text
            FROM s2
        ),
        s4 AS (
            SELECT doc_id, text,
                   len(string_split(text, ' ')) AS n_words,
                   CAST(floor(len(replace(text, ' ', '')) * 100
                              / len(string_split(text, ' '))) AS BIGINT)
                       AS awl
            FROM s3
        )
        SELECT doc_id, text FROM s4
        WHERE n_words >= 20 AND awl BETWEEN 200 AND 900
        """
    ).fetchall()
    want = {(r[0], r[1]) for r in want}

    assert got == want
    kept_classes = {d % 5 for d, _ in got}
    # lorem (1), blocked (3), and thin (4) cohorts are gone; the nav line
    # is gone from every survivor; PII never reaches the output
    assert kept_classes == {0, 2}
    for _, text in got:
        assert nav not in text
        assert "@example.com" not in text and "555-123-4567" not in text
    assert any("<EMAIL>" in t and "<IP>" in t and "<PHONE>" in t for _, t in got)


def test_bloom_probe_null_key_is_never_seen(spark):
    """A NULL candidate key must surface as probably_seen=false — not
    vanish from the output (plain explode would drop the row) and not
    poison the rollup with a null sum."""
    from ocr_project_spark.bloomset import bloom_build, bloom_probe

    seen = spark.createDataFrame([("alpha",), ("beta",)], ["key"])
    bloom = bloom_build(seen)
    cands = spark.createDataFrame(
        [(1, "alpha"), (2, None), (3, "gamma")], "doc_id long, key string"
    )
    got = {
        r["doc_id"]: r["probably_seen"]
        for r in bloom_probe(cands, bloom).collect()
    }
    assert got == {1: True, 2: False, 3: False}


def test_importance_empty_target_selects_nothing(spark, documents):
    """DSIR with an empty target corpus must select zero documents —
    the degenerate cross-multiplication (0 >= 0) would otherwise select
    everything with NaN weights."""
    from ocr_project_spark.textops import importance_weights

    empty = documents.where("doc_id < 0").select("doc_id", "text")
    out = importance_weights(documents.limit(20), empty, n=2)
    assert out.where("selected").count() == 0


def test_bloom_probe_duplicate_candidate_ids(spark):
    """A candidate id appearing on multiple input rows must not flip a
    definitely-seen key to probably_seen=false (sum(hit)==k breaks on
    duplicates; the aggregation is min-based and duplicate-invariant)."""
    from ocr_project_spark.bloomset import bloom_build, bloom_probe

    seen = spark.createDataFrame([("alpha",)], ["key"])
    bloom = bloom_build(seen)
    cands = spark.createDataFrame(
        [(1, "alpha"), (1, "alpha"), (2, "alpha"), (3, "nope")],
        "doc_id long, key string",
    )
    got = {
        r["doc_id"]: r["probably_seen"]
        for r in bloom_probe(cands, bloom).collect()
    }
    assert got == {1: True, 2: True, 3: False}


def test_canonical_url_strips_port_before_query(spark):
    """Default ports must drop when the authority is followed directly by
    a query string, not only by a path or end-of-string — otherwise the
    same page keeps two canonical keys."""
    from ocr_project_spark.functions.urls import canonical_url

    rows = spark.createDataFrame(
        [
            ("http://example.com:80?x=1",),
            ("http://example.com?x=1",),
            ("https://example.com:443?x=1",),
            ("https://example.com:8443/a",),  # non-default port survives
        ],
        ["url"],
    ).select(canonical_url(F.col("url")).alias("c"))
    got = [r["c"] for r in rows.collect()]
    assert got == [
        "http://example.com?x=1",
        "http://example.com?x=1",
        "https://example.com?x=1",
        "https://example.com:8443/a",
    ]


def test_bloom_merge_requires_a_filter():
    import pytest

    from ocr_project_spark.bloomset import bloom_merge

    with pytest.raises(ValueError, match="at least one filter"):
        bloom_merge()
