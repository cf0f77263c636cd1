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


def test_ivf_distributed_training_matches_scale_contract(spark):
    """Distributed Lloyd training: deterministic across runs, unit-norm
    centroids, and recall vs brute force at least as good as the sampled
    trainer's floor."""
    import numpy as np

    from ocr_project_spark.similarity import (
        brute_force_topk,
        ivf_centroids_distributed,
        ivf_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    c1 = ivf_centroids_distributed(emb, n_cells=8, iters=4)
    c2 = ivf_centroids_distributed(emb, n_cells=8, iters=4)
    assert np.array_equal(c1, c2)
    assert np.allclose(np.linalg.norm(c1, axis=1), 1.0, atol=1e-9)

    queries = emb.where("vec_id < 10")
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(
            emb, queries, k=5, n_cells=8, n_probe=4, train="distributed"
        ).collect()
    }
    recall = len(truth & got) / len(truth)
    assert recall >= 0.6, f"distributed-IVF recall {recall:.2f} too low"


def test_embedding_dedup_keep_drops_planted_copies(spark):
    from pyspark.sql import functions as F

    from ocr_project_spark.similarity import embedding_dedup_keep

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    corpus = emb.unionByName(
        emb.select((F.col("vec_id") + 100000).alias("vec_id"), "embedding")
    )
    kept = {r["vec_id"] for r in embedding_dedup_keep(corpus, 0.95).collect()}
    originals = {r["vec_id"] for r in emb.collect()}
    assert kept == originals

def test_semdedup_drops_planted_copies(spark):
    """SemDeDup end-to-end: exact copies land in their original's k-means
    cell (identical vector -> identical nearest centroid) and are dropped;
    the kept set is exactly the originals."""
    from ocr_project_spark.similarity import semdedup_keep

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    corpus = emb.unionByName(
        emb.select((F.col("vec_id") + 100000).alias("vec_id"), "embedding")
    )
    kept = {r["vec_id"] for r in semdedup_keep(corpus, 0.95, n_cells=8).collect()}
    originals = {r["vec_id"] for r in emb.collect()}
    assert kept == originals


def test_semdedup_is_cluster_scoped(spark):
    """The published SemDeDup approximation: a near-dup pair that straddles
    a cluster boundary is NOT found (and survives dedup), while the same
    pair inside one cluster is. Centroids pinned so the cell split is
    exact."""
    from ocr_project_spark.similarity import semdedup_keep, semdedup_pairs

    centroids = np.array([[1.0, 0.0], [0.6, 0.8]])
    rows = [
        (1, [1.0, 0.0]),   # cell 0
        (2, [0.8, 0.6]),   # cell 1 (cos vs c1 = 0.8 < 0.96 vs c2)
        (3, [0.8, 0.6]),   # cell 1, exact copy of 2
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = semdedup_pairs(df, threshold=0.7, centroids=centroids)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    # cos(v1, v2) = 0.8 >= 0.7 but the pair crosses clusters -> absent;
    # the in-cluster exact copy is found
    assert got == {(2, 3)}
    kept = {
        r["vec_id"]
        for r in semdedup_keep(df, threshold=0.7, centroids=centroids).collect()
    }
    assert kept == {1, 2}


def test_prototype_prune_drop_counts_and_determinism(spark, embeddings):
    """D4-style pruning: every cell drops exactly floor(n/4) of its most
    prototypical members (integer-ratio rule), the output partitions the
    corpus, and the kept set is invariant under repartitioning."""
    from ocr_project_spark.similarity import ivf_centroids, prototype_prune

    emb = embeddings.select("vec_id", "embedding")
    cents = ivf_centroids(emb, n_cells=8, dim=64, sample_fraction=1.0)
    out = prototype_prune(emb, cents, drop_num=1, drop_den=4).collect()
    assert len(out) == emb.count()
    by_cell = {}
    for r in out:
        by_cell.setdefault(r["cell"], []).append(r)
    for cell, rows in by_cell.items():
        n = len(rows)
        dropped = [r for r in rows if not r["kept"]]
        assert len(dropped) == n // 4
        # the dropped ones are the MOST prototypical of the cell
        min_dropped = min((r["prototypicality"] for r in dropped), default=None)
        if min_dropped is not None:
            kept_higher = [
                r
                for r in rows
                if r["kept"] and r["prototypicality"] > min_dropped
            ]
            assert kept_higher == []

    again = {
        (r["vec_id"], r["kept"])
        for r in prototype_prune(
            emb.repartition(7), cents, drop_num=1, drop_den=4
        ).collect()
    }
    assert again == {(r["vec_id"], r["kept"]) for r in out}


def test_ivf_centroids_repartition_invariant(spark, embeddings):
    """Centroid training must be a pure function of the data — identical
    bits across partition layouts (the md5-ordered slice; df.sample would
    depend on partitioning), because keep-lists build on the centroids."""
    import numpy as np

    from ocr_project_spark.similarity import ivf_centroids, pq_codebooks

    small = embeddings.limit(400)
    c1 = ivf_centroids(small.repartition(1), n_cells=4, target_points=100)
    c2 = ivf_centroids(small.repartition(7), n_cells=4, target_points=100)
    assert np.array_equal(c1, c2)

    b1 = pq_codebooks(small.repartition(2), m_sub=4, n_codes=4, target_points=64)
    b2 = pq_codebooks(small.repartition(5), m_sub=4, n_codes=4, target_points=64)
    assert np.array_equal(b1, b2)


def test_ivf_centroids_empty_corpus_raises(spark):
    import pytest as _pytest

    from ocr_project_spark.similarity import ivf_centroids

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with _pytest.raises(ValueError, match="empty embeddings"):
        ivf_centroids(empty, n_cells=4)


def test_zero_norm_embedding_does_not_kill_cosine_ops(spark):
    """ANSI-mode crash-proofing: one all-zeros vector must not raise
    DIVIDE_BY_ZERO across the cosine family; it simply scores 0."""
    from ocr_project_spark.similarity import brute_force_topk

    emb = spark.createDataFrame(
        [(1, [0.0] * 4), (2, [1.0, 0.0, 0.0, 0.0]), (3, [0.0, 1.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    out = brute_force_topk(emb, emb.where("vec_id = 2"), k=2).collect()
    assert len(out) == 2  # ranks exist; the zero vector scored 0, not a crash


def test_fractional_sample_fraction_rejected(spark):
    import pytest

    from ocr_project_spark.similarity import ivf_centroids

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="fractional sample_fraction"):
        ivf_centroids(emb, n_cells=1, sample_fraction=0.5)
