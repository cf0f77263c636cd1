"""Similarity search over embedding columns (training-data pipeline).

Two paths:

- brute-force cosine top-k — broadcast the (small) query set, JVM-side dot
  product via ``zip_with``/``aggregate`` lambda expressions, window rank.
  The exactness baseline; at 100 TB this is one narrow pass over the corpus
  per query batch (no corpus shuffle — only the final per-query top-k agg).
- random-hyperplane LSH top-k — deterministic seeded hyperplanes bucket the
  corpus; queries probe their own bucket only. The scale path: candidate
  count per query is corpus/2^planes, tunable; recall measured against the
  brute baseline in tests.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F

HYPERPLANE_SEED = 0x91A  # deterministic LSH seed


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 6,
    dim: int = 64,
    n_tables: int = 8,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: LSH-bucketed candidate
    generation (union over ``n_tables`` sign-random-projection tables) with
    exact-cosine verification of candidates only.

    High-cosine pairs almost surely share a bucket in some table (a pair at
    cosine c collides per table with prob (1 - acos(c)/π)^n_planes; at
    c ≥ 0.95 and 6 planes that's ≥ 0.63 per table → miss prob ≤ 4e-5 with 8
    tables), so the join shuffles candidate pairs, never all-pairs — the
    100 TB path. Output: (id_a, id_b, cosine), id_a < id_b.
    """
    bucketed = lsh_bucket(embeddings, n_planes, dim, n_tables)
    a = bucketed.select(
        "table",
        "bucket",
        F.col("vec_id").alias("id_a"),
        F.col("embedding").cast("array<double>").alias("vec_a"),
    )
    b = bucketed.select(
        "table",
        "bucket",
        F.col("vec_id").alias("id_b"),
        F.col("embedding").cast("array<double>").alias("vec_b"),
    )
    cands = a.join(b, ["table", "bucket"]).where(F.col("id_a") < F.col("id_b"))
    # score before dedup: the multi-table-collision dedup then shuffles one
    # scalar per candidate instead of two dim-length vectors (true near-dups
    # collide in MOST tables, so the vector-carrying dedup was the dominant
    # shuffle); the threshold filter also runs pre-shuffle, map-side.
    return (
        cands.select(
            "id_a", "id_b", _cosine(F.col("vec_a"), F.col("vec_b")).alias("cosine")
        )
        .where(F.col("cosine") >= threshold)
        .dropDuplicates(["id_a", "id_b"])
    )


def embedding_dedup_keep(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 6,
    dim: int = 64,
    n_tables: int = 8,
) -> DataFrame:
    """Embedding-dedup materializer: the vec_ids a training pipeline keeps
    after near-duplicate removal — the verified near-dup pairs of
    :func:`embedding_near_dup_pairs` collapse into connected components
    (components.connected_components) and each cluster keeps its min-id
    representative, singletons survive. Transitive closure matters here
    exactly as in the hash families: A~B, B~C must drop both B and C even
    when the (A,C) pair never crossed the cosine threshold. The anti-join
    is on the (small) drop set; the corpus itself never re-shuffles."""
    from ocr_project_spark.components import near_dup_keep

    pairs = embedding_near_dup_pairs(embeddings, threshold, n_planes, dim, n_tables)
    return near_dup_keep(
        embeddings, pairs.select("id_a", "id_b"), id_col="vec_id"
    ).select(F.col("doc_id").alias("vec_id"))


def semdedup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_cells: int = 16,
    dim: int = 64,
    centroids: np.ndarray | None = None,
    train: str = "sample",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540) candidate pairs:
    k-means-cluster the corpus embeddings (the IVF coarse quantizer is
    exactly the published clustering step), then compare pairs WITHIN a
    cluster only — the published approximation that makes semantic dedup
    linear-ish: candidate volume is Σ|cell|²/2 ≈ n²/(2·n_cells), so
    ``n_cells`` must grow with the corpus (SemDeDup uses 50 000 clusters
    for LAION-440M; rule of thumb n_cells ∝ n keeps per-cell work flat).
    A near-duplicate pair that straddles a cluster boundary is NOT found —
    that is the algorithm's documented recall trade-off (asserted in
    tests), not a defect; exact copies always share a cell (identical
    vector ⇒ identical nearest centroid). Output: (id_a, id_b, cosine),
    id_a < id_b, cosine ≥ threshold.

    Scale shape: centroid training never collects corpus vectors
    (``train="distributed"`` runs per-partition partial Lloyd); cell
    assignment is one narrow Arrow matmul pass; the self-join shuffles on
    the cell id. Scoring happens before the (absent) dedup — each pair is
    generated exactly once, unlike multi-table LSH."""
    if centroids is None:
        if train == "distributed":
            centroids = ivf_centroids_distributed(embeddings, n_cells, dim)
        else:
            centroids = ivf_centroids(embeddings, n_cells, dim)
    cells = _assign_cells(embeddings, centroids, "vec_id")
    a = cells.select(
        "cell",
        F.col("vec_id").alias("id_a"),
        F.col("embedding").cast("array<double>").alias("vec_a"),
    )
    b = cells.select(
        "cell",
        F.col("vec_id").alias("id_b"),
        F.col("embedding").cast("array<double>").alias("vec_b"),
    )
    return (
        a.join(b, "cell")
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b", _cosine(F.col("vec_a"), F.col("vec_b")).alias("cosine")
        )
        .where(F.col("cosine") >= threshold)
    )


def semdedup_keep(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_cells: int = 16,
    dim: int = 64,
    centroids: np.ndarray | None = None,
    train: str = "sample",
) -> DataFrame:
    """SemDeDup keep-list: within-cluster near-dup pairs collapse into
    connected components; each component keeps its min-id representative.
    Returns (vec_id,) of kept vectors — the corpus a training pipeline
    retains after semantic deduplication."""
    from ocr_project_spark.components import near_dup_keep

    pairs = semdedup_pairs(embeddings, threshold, n_cells, dim, centroids, train)
    return near_dup_keep(
        embeddings, pairs.select("id_a", "id_b"), id_col="vec_id"
    ).select(F.col("doc_id").alias("vec_id"))


def prototype_prune(
    embeddings: DataFrame,
    centroids: np.ndarray,
    drop_num: int = 1,
    drop_den: int = 4,
) -> DataFrame:
    """D4-style diversity pruning (Tirumala et al. 2023 "D4", building on
    Sorscher et al. 2022 "Beyond neural scaling laws"): rank each example
    by PROTOTYPICALITY — cosine to its cluster centroid — and drop the
    most prototypical ``drop_num/drop_den`` of every cluster: the
    near-centroid examples are the redundant ones; the cluster's fringe
    carries the diversity worth training on.

    Deterministic end-to-end: the keep rule is integer cross-multiplication
    (rank·den > n_cell·num — no float threshold), prototypicality is
    rounded to 6 decimals BEFORE ranking (ties break on vec_id ascending),
    and assignment ties break on the lowest cell index, so the kept set is
    a pure function of (embeddings, centroids).

    Scale shape: cell assignment is one narrow Arrow matmul pass; the
    centroid table broadcasts (n_cells rows); the rank runs per-cell — one
    hash exchange on the cell id. Cells number in the thousands at corpus
    scale, so per-cell partitions stay small; for degenerate mega-cells
    use the threshold-sampling pattern of ``cap_per_host(approximate=True)``.
    Output: (vec_id, cell, prototypicality, kept)."""
    spark = embeddings.sparkSession
    cent = spark.createDataFrame(
        [(int(j), [float(x) for x in centroids[j]]) for j in range(len(centroids))],
        "cell int, centroid array<double>",
    )
    cells = _assign_cells(embeddings, centroids, "vec_id")
    scored = cells.join(F.broadcast(cent), "cell").select(
        "vec_id",
        "cell",
        F.round(
            _cosine(F.col("embedding").cast("array<double>"), F.col("centroid")), 6
        ).alias("prototypicality"),
    )
    w = Window.partitionBy("cell").orderBy(
        F.desc("prototypicality"), F.asc("vec_id")
    )
    wc = Window.partitionBy("cell")
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(wc))
        .select(
            "vec_id",
            F.col("cell").cast("long").alias("cell"),
            "prototypicality",
            (
                F.col("__rk") * F.lit(drop_den) > F.col("__n") * F.lit(drop_num)
            ).alias("kept"),
        )
    )


def _cosine(vec_a, vec_b):
    dot = F.aggregate(
        F.zip_with(vec_a, vec_b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )
    norm = lambda v: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(v, lambda x: x * x),
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x,
        )
    )
    # greatest(…, 1e-12): a zero-norm vector must score cosine 0 on its
    # own rows, not raise DIVIDE_BY_ZERO under ANSI and kill the job —
    # the numpy kernels in this file guard the same way
    return dot / F.greatest(norm(vec_a) * norm(vec_b), F.lit(1e-12))


def brute_force_topk(
    embeddings: DataFrame, queries: DataFrame, k: int = 5
) -> DataFrame:
    """Exact cosine top-k: corpus × broadcast(queries) → window rank ≤ k.

    Excludes self-matches. Ties broken by neighbor id (deterministic).
    Output: (query_id, rank, neighbor_id).
    """
    corpus = embeddings.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").cast("array<double>").alias("vec_n"),
    )
    qs = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("vec_q"),
    )
    scored = corpus.join(F.broadcast(qs), F.col("neighbor_id") != F.col("query_id")).select(
        "query_id",
        "neighbor_id",
        _cosine(F.col("vec_q"), F.col("vec_n")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id")
    )


def _hyperplanes(dim: int, n_planes: int, table: int = 0) -> np.ndarray:
    rng = np.random.default_rng(HYPERPLANE_SEED + table)
    return rng.standard_normal((n_planes, dim))


def lsh_bucket(
    embeddings: DataFrame, n_planes: int = 6, dim: int = 64, n_tables: int = 1
) -> DataFrame:
    """Sign-random-projection bucket ids per vector, one row per (vector,
    table). Vectorized numpy over Arrow batches: one matmul per (batch,
    table). With ``n_tables=1`` this is plain single-table SRP-LSH; more
    tables trade candidate volume for recall (union of per-table buckets).
    """
    planes = [_hyperplanes(dim, n_planes, t) for t in range(n_tables)]
    weights = 1 << np.arange(n_planes)

    def _bucket(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):  # Arrow may deliver an empty batch
                continue
            mat = np.vstack(pdf["embedding"].to_numpy())
            frames = []
            for t, pl in enumerate(planes):
                signs = (mat @ pl.T) > 0
                buckets = (signs * weights).sum(axis=1)
                frames.append(
                    pd.DataFrame(
                        {
                            "vec_id": pdf["vec_id"],
                            "table": t,
                            "bucket": buckets.astype(np.int64),
                            "embedding": pdf["embedding"],
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    return embeddings.select("vec_id", "embedding").mapInPandas(
        _bucket, schema="vec_id long, table int, bucket long, embedding array<double>"
    )


def ivf_centroids(
    embeddings: DataFrame,
    n_cells: int = 16,
    dim: int = 64,
    iters: int = 10,
    sample_fraction: float | None = None,
    seed: int = HYPERPLANE_SEED,
    target_points: int | None = None,
) -> np.ndarray:
    """IVF coarse quantizer: k-means centroids trained on a bounded
    driver-side collect. k-means needs only ~1000·n_cells points; the
    training slice is the ``target_points`` lowest rows by
    ``(md5(vec_id), vec_id)`` — a PURE FUNCTION OF THE DATA, so the
    centroids (and every keep-list built on them) are identical across
    repartitions and resumes, where ``df.sample(seed)`` depends on
    partition layout (the repo determinism invariant; the same reason
    ``hash_split`` never samples). One TakeOrdered pass (per-partition
    top-k, driver merge) — the corpus itself never reaches the driver.
    ``sample_fraction >= 1.0`` collects every row in arrival order (test
    hook for tiny corpora). Deterministic: ordered slice + seeded init,
    fixed iteration count."""
    target = target_points or 1000 * n_cells
    if sample_fraction is not None and 0.0 < sample_fraction < 1.0:
        raise ValueError(
            "fractional sample_fraction is not supported (sampling would "
            "break repartition-invariance); size the slice with "
            "target_points, or pass sample_fraction>=1.0 to train on "
            "every row"
        )
    if sample_fraction is not None and sample_fraction >= 1.0:
        src = embeddings.select("embedding")
    else:
        key = F.col("vec_id").cast("string")
        src = (
            embeddings.select("vec_id", "embedding")
            .orderBy(F.md5(key), F.col("vec_id"))
            .limit(target)
            .select("embedding")
        )
    mat = np.array(
        [r["embedding"] for r in src.collect()],
        dtype=np.float64,
    )
    if not len(mat):
        raise ValueError(
            "cannot train IVF centroids on an empty embeddings table"
        )
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    centroids = mat[rng.choice(len(mat), size=min(n_cells, len(mat)), replace=False)]
    for _ in range(iters):
        assign = (mat @ centroids.T).argmax(axis=1)
        for c in range(len(centroids)):
            members = mat[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
                centroids[c] /= max(np.linalg.norm(centroids[c]), 1e-12)
    return centroids


def ivf_centroids_distributed(
    embeddings: DataFrame,
    n_cells: int = 16,
    dim: int = 64,
    iters: int = 10,
    seed: int = HYPERPLANE_SEED,
) -> np.ndarray:
    """IVF coarse quantizer trained fully distributed: each Lloyd iteration
    is one narrow ``mapInPandas`` pass emitting per-partition partial
    (cell, vector-sum, count) rows — the driver only ever combines
    ``n_cells × n_partitions`` tiny aggregate rows, never corpus vectors,
    so training holds at 10^12 documents unchanged. Initialization uses the
    bounded seeded sample of :func:`ivf_centroids` (a few thousand points).
    Deterministic: seeded init, fixed iteration count, partition-ordered
    float combine."""
    centroids = ivf_centroids(
        embeddings, n_cells, dim, iters=0, seed=seed,
        target_points=max(50 * n_cells, 1000),
    )
    n_cells_actual = len(centroids)
    src = embeddings.select("embedding")
    schema = "cell int, vec_sum array<double>, n long"
    for _ in range(iters):
        c = centroids

        def _partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            sums = np.zeros((n_cells_actual, dim), dtype=np.float64)
            counts = np.zeros(n_cells_actual, dtype=np.int64)
            seen = False
            for pdf in batches:
                if not len(pdf):
                    continue
                seen = True
                mat = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
                mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
                assign = (mat @ c.T).argmax(axis=1)
                np.add.at(sums, assign, mat)
                counts += np.bincount(assign, minlength=n_cells_actual)
            if seen:
                yield pd.DataFrame(
                    {
                        "cell": np.arange(n_cells_actual, dtype=np.int32),
                        "vec_sum": list(sums),
                        "n": counts,
                    }
                )

        parts = src.mapInPandas(_partial, schema=schema).collect()
        sums = np.zeros((n_cells_actual, dim), dtype=np.float64)
        counts = np.zeros(n_cells_actual, dtype=np.int64)
        for row in parts:
            sums[row["cell"]] += np.asarray(row["vec_sum"], dtype=np.float64)
            counts[row["cell"]] += row["n"]
        nxt = centroids.copy()
        nonempty = counts > 0
        nxt[nonempty] = sums[nonempty] / counts[nonempty, None]
        nxt /= np.maximum(np.linalg.norm(nxt, axis=1, keepdims=True), 1e-12)
        centroids = nxt
    return centroids


def _assign_cells(embeddings: DataFrame, centroids: np.ndarray, id_alias: str) -> DataFrame:
    """Narrow pass: nearest-centroid cell id per vector (one matmul/batch)."""

    def _cells(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):  # Arrow may deliver an empty batch
                continue
            mat = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
            mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            cells = (mat @ centroids.T).argmax(axis=1)
            yield pd.DataFrame(
                {
                    id_alias: pdf["vec_id"],
                    "cell": cells.astype(np.int32),
                    "embedding": pdf["embedding"],
                }
            )

    return embeddings.select("vec_id", "embedding").mapInPandas(
        _cells, schema=f"{id_alias} long, cell int, embedding array<double>"
    )


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    dim: int = 64,
    centroids: np.ndarray | None = None,
    train: str = "sample",
) -> DataFrame:
    """IVF approximate top-k: corpus vectors are inverted-listed by nearest
    centroid (one narrow pass); each query probes only its ``n_probe``
    nearest cells. The join shuffles on the cell id — candidates per query ≈
    corpus · n_probe / n_cells, the scale knob. Recall vs brute force is
    asserted in tests.

    ``train``: ``"sample"`` trains the quantizer on a bounded seeded sample
    (cheap, default); ``"distributed"`` runs full-corpus Lloyd iterations
    with per-partition partial aggregation — the driver never sees corpus
    vectors at all."""
    if centroids is None:
        if train == "distributed":
            centroids = ivf_centroids_distributed(embeddings, n_cells, dim)
        else:
            centroids = ivf_centroids(embeddings, n_cells, dim)
    corpus_cells = _assign_cells(embeddings, centroids, "neighbor_id").select(
        "neighbor_id", "cell", F.col("embedding").cast("array<double>").alias("vec_n")
    )

    def _probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):  # Arrow may deliver an empty batch
                continue
            mat = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
            matn = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            order = np.argsort(-(matn @ centroids.T), axis=1)[:, :n_probe]
            # one row per (query, probed cell); embedding repeated per probe
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(pdf["vec_id"].to_numpy(), n_probe),
                    "cell": order.reshape(-1).astype(np.int32),
                    "embedding": [
                        e for e in pdf["embedding"] for _ in range(n_probe)
                    ],
                }
            )

    query_cells = queries.select("vec_id", "embedding").mapInPandas(
        _probe, schema="query_id long, cell int, embedding array<double>"
    ).select("query_id", "cell", F.col("embedding").cast("array<double>").alias("vec_q"))

    scored = corpus_cells.join(F.broadcast(query_cells), "cell").where(
        F.col("neighbor_id") != F.col("query_id")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.select(
            "query_id",
            "neighbor_id",
            _cosine(F.col("vec_q"), F.col("vec_n")).alias("cosine"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id")
    )


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 6,
    dim: int = 64,
    n_tables: int = 4,
) -> DataFrame:
    """Approximate top-k: rank only candidates sharing an LSH bucket with the
    query in at least one of ``n_tables`` independent hash tables.

    The corpus-side bucket assignment is one narrow pass (n_tables rows per
    vector); the join shuffles on the (table, bucket) key, ~n_tables ×
    corpus / 2^n_planes candidates per query before dedup. Recall vs
    :func:`brute_force_topk` is asserted in tests; raise ``n_tables`` (or
    lower ``n_planes``) for more recall at more cost.
    """
    corpus_b = lsh_bucket(embeddings, n_planes, dim, n_tables).select(
        F.col("vec_id").alias("neighbor_id"),
        "table",
        "bucket",
        F.col("embedding").cast("array<double>").alias("vec_n"),
    )
    query_b = lsh_bucket(queries, n_planes, dim, n_tables).select(
        F.col("vec_id").alias("query_id"),
        "table",
        "bucket",
        F.col("embedding").cast("array<double>").alias("vec_q"),
    )
    cands = corpus_b.join(F.broadcast(query_b), ["table", "bucket"]).where(
        F.col("neighbor_id") != F.col("query_id")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        # score BEFORE deduplicating multi-table collisions: cosine is a
        # deterministic function of the pair, so the dedup shuffle carries
        # one scalar instead of two dim-length vectors per candidate (the
        # redundant JVM cosine on a colliding copy is codegen-cheap; the
        # shuffle bytes are the scale cost)
        cands.select(
            "query_id",
            "neighbor_id",
            _cosine(F.col("vec_q"), F.col("vec_n")).alias("cosine"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id")
    )


def pq_codebooks(
    embeddings: DataFrame,
    m_sub: int = 8,
    n_codes: int = 16,
    dim: int = 64,
    iters: int = 10,
    seed: int = HYPERPLANE_SEED,
    target_points: int | None = None,
) -> np.ndarray:
    """Product-quantization codebooks (Jégou et al. 2011, "Product
    Quantization for Nearest Neighbor Search"): the vector space splits
    into ``m_sub`` subspaces of ``dim/m_sub`` dims and each learns its own
    ``n_codes``-centroid L2 k-means codebook, so a vector compresses to
    ``m_sub`` small codes (here 8 codes ≈ 8 bytes vs 256 bytes of floats).
    Trained like :func:`ivf_centroids` on the ``(md5(vec_id), vec_id)``-
    ordered bounded slice — a pure function of the data, so codebooks are
    repartition/resume-invariant (``df.sample`` is not) and the corpus
    never reaches the driver. Vectors are L2-normalized first
    (‖q−x‖² = 2−2·cos on the unit sphere, so ADC ranking matches cosine
    ranking). Deterministic: ordered slice + seeded init, fixed
    iterations. Shape: (m_sub, n_codes, sub)."""
    sub = dim // m_sub
    if sub * m_sub != dim:
        raise ValueError(f"dim {dim} not divisible by m_sub {m_sub}")
    target = target_points or 1000 * n_codes
    key = F.col("vec_id").cast("string")
    src = (
        embeddings.select("vec_id", "embedding")
        .orderBy(F.md5(key), F.col("vec_id"))
        .limit(target)
        .select("embedding")
    )
    mat = np.array(
        [r["embedding"] for r in src.collect()],
        dtype=np.float64,
    )
    if not len(mat):
        raise ValueError(
            "cannot train PQ codebooks on an empty embeddings table"
        )
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    books = np.empty((m_sub, n_codes, sub), dtype=np.float64)
    for m in range(m_sub):
        pts = mat[:, m * sub : (m + 1) * sub]
        cb = pts[rng.choice(len(pts), size=min(n_codes, len(pts)), replace=False)]
        for _ in range(iters):
            d = ((pts[:, None, :] - cb[None, :, :]) ** 2).sum(axis=2)
            assign = d.argmin(axis=1)
            for c in range(len(cb)):
                members = pts[assign == c]
                if len(members):
                    cb[c] = members.mean(axis=0)
        books[m, : len(cb)] = cb
        if len(cb) < n_codes:
            books[m, len(cb) :] = cb[-1]
    return books


def ivfpq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    m_sub: int = 8,
    n_codes: int = 16,
    dim: int = 64,
    centroids: np.ndarray | None = None,
    codebooks: np.ndarray | None = None,
    rerank: int = 4,
) -> DataFrame:
    """IVF-PQ approximate top-k (the FAISS ``IVFx,PQy`` index as a
    DataFrame plan): IVF cells prune candidates exactly like
    :func:`ivf_topk`, but the inverted lists carry ``m_sub`` PQ codes per
    vector instead of the raw floats — at 100 TB the shuffled candidate
    row shrinks from dim·8 bytes to ~m_sub bytes, which is the difference
    between an in-memory index and a spilling one. Scoring is asymmetric
    distance (ADC): each query precomputes its subspace-to-codebook
    distance table, and a candidate's distance is the sum of ``m_sub``
    table lookups. With ``rerank`` > 0 the ADC shortlist (``k·rerank``
    candidates per query) is re-scored with exact cosines against the raw
    vectors — the standard two-stage shape: PQ absorbs the full candidate
    volume, the expensive exact pass touches only ``k·rerank`` rows per
    query (``rerank=0`` ranks by raw ADC).

    The ADC path is pure DataFrame algebra — candidate codes posexplode to
    (pair, subspace, code) rows, hash-join the broadcast per-query distance
    table (queries·m_sub·n_codes tiny rows), and a partial-aggregated
    groupBy sums the lookups — so the hot path never leaves the JVM; Arrow
    passes only assign cells/codes (one narrow pass each). Ranking: ADC
    asc, id asc. Exact-copy guarantee: an identical vector shares the
    query's cell and codes, so its ADC is the global minimum — the planted
    driver oracle ranks copies first; recall vs brute force is asserted in
    tests."""
    if centroids is None:
        centroids = ivf_centroids(embeddings, n_cells, dim)
    if codebooks is None:
        codebooks = pq_codebooks(embeddings, m_sub, n_codes, dim)
    m_books, K, sub = codebooks.shape

    def _corpus(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # ONE fused pass: normalize, assign cell, PQ-encode — the corpus is
        # scanned once and only (id, cell, m_sub codes) ever leaves Python
        for pdf in batches:
            if not len(pdf):  # Arrow may deliver an empty batch
                continue
            mat = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
            mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            cells = (mat @ centroids.T).argmax(axis=1)
            codes = np.empty((len(mat), m_books), dtype=np.int32)
            for m in range(m_books):
                pts = mat[:, m * sub : (m + 1) * sub]
                d = ((pts[:, None, :] - codebooks[m][None, :, :]) ** 2).sum(axis=2)
                codes[:, m] = d.argmin(axis=1)
            yield pd.DataFrame(
                {
                    "neighbor_id": pdf["vec_id"],
                    "cell": cells.astype(np.int32),
                    "codes": list(codes),
                }
            )

    inverted = embeddings.select("vec_id", "embedding").mapInPandas(
        _corpus, schema="neighbor_id long, cell int, codes array<int>"
    )

    def _qtab(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per query: probed cells + the full ADC distance table
        for pdf in batches:
            if not len(pdf):  # Arrow may deliver an empty batch
                continue
            mat = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
            matn = mat / np.maximum(
                np.linalg.norm(mat, axis=1, keepdims=True), 1e-12
            )
            order = np.argsort(-(matn @ centroids.T), axis=1)[:, :n_probe]
            cells, dists = [], []
            for qi in range(len(matn)):
                tab = np.empty((m_books, K), dtype=np.float64)
                for m in range(m_books):
                    qsub = matn[qi, m * sub : (m + 1) * sub]
                    tab[m] = ((codebooks[m] - qsub[None, :]) ** 2).sum(axis=1)
                cells.append(order[qi].astype(np.int32))
                dists.append(tab.reshape(-1))
            yield pd.DataFrame(
                {
                    "query_id": pdf["vec_id"],
                    "cells": cells,
                    "dtab": dists,
                }
            )

    qrows = queries.select("vec_id", "embedding").mapInPandas(
        _qtab, schema="query_id long, cells array<int>, dtab array<double>"
    )
    query_cells = qrows.select(
        "query_id", F.explode("cells").alias("cell")
    )
    dtab = qrows.select(
        "query_id", F.posexplode("dtab").alias("pos", "d")
    ).select(
        "query_id",
        (F.col("pos") / K).cast("int").alias("m"),
        (F.col("pos") % K).cast("int").alias("code"),
        "d",
    )

    cands = inverted.join(F.broadcast(query_cells), "cell").where(
        F.col("neighbor_id") != F.col("query_id")
    )
    adc = (
        cands.select(
            "query_id",
            "neighbor_id",
            F.posexplode("codes").alias("m", "code"),
        )
        .join(F.broadcast(dtab), ["query_id", "m", "code"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("d").alias("adc"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adc"), F.asc("neighbor_id"))
    if not rerank:
        return (
            adc.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id")
        )
    shortlist = (
        adc.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k * rerank)
        .select("query_id", "neighbor_id")
    )
    corpus_vecs = embeddings.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").cast("array<double>").alias("vec_n"),
    )
    query_vecs = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("vec_q"),
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        shortlist.join(corpus_vecs, "neighbor_id")
        .join(F.broadcast(query_vecs), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            _cosine(F.col("vec_q"), F.col("vec_n")).alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id")
    )
