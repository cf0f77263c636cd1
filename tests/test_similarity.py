"""Similarity-search tests: brute-force cosine top-k exactness and LSH
recall against the brute baseline over the driver embeddings table.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from ocr_project_spark.similarity import (
    brute_force_topk,
    embedding_near_dup_pairs,
    lsh_bucket,
    lsh_topk,
)

K = 5
N_QUERIES = 10


@pytest.fixture(scope="module")
def embeddings(spark):
    import tests.conftest as c

    return spark.read.parquet(f"{c.SF_DIR}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def queries(embeddings):
    return embeddings.where(F.col("vec_id") < N_QUERIES).cache()


def test_brute_force_matches_numpy(embeddings, queries):
    rows = embeddings.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    normed = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    got = brute_force_topk(embeddings, queries, k=K).collect()
    by_query = {}
    for r in got:
        by_query.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"]))
    for qid, neighbors in by_query.items():
        qvec = normed[ids == qid][0]
        sims = normed @ qvec
        sims[ids == qid] = -np.inf
        # numpy top-k with the same (desc cosine, asc id) tiebreak
        order = sorted(zip(-sims, ids), key=lambda t: (t[0], t[1]))[:K]
        expect = [int(i) for _, i in order]
        assert [n for _, n in sorted(neighbors)] == expect


def test_brute_force_shape(embeddings, queries):
    got = brute_force_topk(embeddings, queries, k=K)
    counts = got.groupBy("query_id").count().collect()
    assert len(counts) == N_QUERIES
    assert all(r["count"] == K for r in counts)
    assert got.where(F.col("query_id") == F.col("neighbor_id")).count() == 0


def test_lsh_bucket_deterministic(embeddings):
    b1 = {
        (r["vec_id"], r["table"]): r["bucket"]
        for r in lsh_bucket(embeddings, n_tables=2).collect()
    }
    b2 = {
        (r["vec_id"], r["table"]): r["bucket"]
        for r in lsh_bucket(embeddings, n_tables=2).collect()
    }
    assert b1 == b2
    buckets_t0 = {b for (_, t), b in b1.items() if t == 0}
    assert 1 < len(buckets_t0) <= 64  # 6 planes → ≤ 64 buckets
    # independent tables hash differently
    assert b1 != {k: b1[(k[0], 0)] for k in b1}


def test_lsh_topk_recall(embeddings, queries):
    brute = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(embeddings, queries, k=K).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in lsh_topk(embeddings, queries, k=K, n_planes=4, n_tables=8).collect()
    }
    recall = len(brute & approx) / len(brute)
    # 8 tables × 16 buckets over 500 vectors: most true neighbors co-bucket
    # in at least one table
    assert recall >= 0.6, f"LSH recall {recall:.2f} too low"
    # and every approx neighbor scores a valid cosine (subset sanity)
    assert all(q != n for q, n in approx)


def test_embedding_near_dup_finds_planted_copies(embeddings):
    """Planted exact copies (vec_id + 100000) must all be recovered with
    cosine ≈ 1; no natural pair reaches the threshold (max ≈ 0.51)."""
    corpus = embeddings.select("vec_id", "embedding").unionByName(
        embeddings.select((F.col("vec_id") + 100000).alias("vec_id"), "embedding")
    )
    pairs = embedding_near_dup_pairs(corpus, threshold=0.95).collect()
    n = embeddings.count()
    assert len(pairs) == n
    for r in pairs:
        assert r["id_b"] == r["id_a"] + 100000
        assert r["cosine"] > 0.999


def test_lsh_more_tables_more_recall(embeddings, queries):
    brute = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(embeddings, queries, k=K).collect()
    }

    def recall(n_tables):
        approx = {
            (r["query_id"], r["neighbor_id"])
            for r in lsh_topk(
                embeddings, queries, k=K, n_planes=4, n_tables=n_tables
            ).collect()
        }
        return len(brute & approx) / len(brute)

    assert recall(8) >= recall(1)
