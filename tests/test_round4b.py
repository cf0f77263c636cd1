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
