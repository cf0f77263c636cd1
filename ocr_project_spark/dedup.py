"""Deduplication operators for the training-data pipeline.

Four families, ordered by scale path:

- exact         — hash-groupBy; the only full-shuffle op, partial-agg friendly.
- minhash+LSH   — shingle → minhash signature (vectorized numpy in an Arrow
                  batch) → banding → bucket join → exact-jaccard verify.
                  Candidate generation is O(n·bands), never all-pairs: the
                  100 TB path.
- simhash       — 64-bit simhash + chunk banding + bit_count hamming verify.
- n-gram jaccard — exact all-pairs *within a blocking key*; O(b²) per block,
                  used as the small-scale verification baseline for the
                  approximate families (and the DuckDB-oracle-checkable one).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

MINHASH_SEED = 0x5EED
SIMHASH_SEED = 0xCAFE

NEAR_DUP_MARKER = "zzznear"
EXACT_DUP_OFFSET = 100_000
NEAR_DUP_OFFSET = 200_000


def dedup_test_corpus(docs: DataFrame) -> DataFrame:
    """Derived corpus with known duplicate structure for differential checks:
    the original documents, an exact copy of each (doc_id + 100000), and a
    first-word-edited near-dup of each (doc_id + 200000). The construction is
    a pure SQL expression so the DuckDB oracle reproduces it verbatim."""
    base = docs.select("doc_id", "text", "lang")
    exact = base.select(
        (F.col("doc_id") + EXACT_DUP_OFFSET).alias("doc_id"), "text", "lang"
    )
    near = base.select(
        (F.col("doc_id") + NEAR_DUP_OFFSET).alias("doc_id"),
        F.regexp_replace("text", "^[^ ]+", NEAR_DUP_MARKER).alias("text"),
        "lang",
    )
    return base.unionByName(exact).unionByName(near)


def exact_dup_groups(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact-duplicate groups by content hash: one row per duplicated text
    with the keeper (min id) and the duplicate count. Map-side partial
    aggregation keeps the shuffle to one row per distinct hash."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("content_md5"))
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .where(F.col("n_copies") > 1)
    )


def dedup_keep(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact-dedup materializer: the surviving doc ids (min id per distinct
    content hash) — the corpus a training pipeline actually keeps. One
    map-side-combinable aggregation; no join back needed when downstream
    only requires ids."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("content_md5"))
        .agg(F.min(id_col).alias("doc_id"))
        .select("doc_id")
    )


def prefix_dup_groups(
    docs: DataFrame, n_words: int = 4, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Near-dup blocking by leading-word prefix (a cheap boilerplate-dedup
    heuristic): groups sharing the first ``n_words`` words."""
    prefix = F.concat_ws(" ", F.slice(F.split(F.col(text_col), " "), 1, n_words))
    return (
        docs.groupBy(prefix.alias("prefix"))
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .where(F.col("n_docs") > 1)
    )


def shingle_sets(
    docs: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Distinct word n-gram shingles per doc (JVM: sequence/transform)."""
    words = F.split(F.col(text_col), " ")
    cnt = F.size(words)
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(cnt - (n - 1), F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(words, i, n)),
        )
    )
    return docs.select(F.col(id_col).alias("doc_id"), grams.alias("shingles"))


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    block_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Exact n-gram-Jaccard near-dup pairs within a blocking key.

    All-pairs *within each block* via a self-equi-join on the block column —
    the shuffle is on the block key, and jaccard is computed with JVM array
    intersect/union. Correct but quadratic per block: the verification
    baseline the LSH family is tested against, and only ever run on blocks
    small enough to enumerate (at 100 TB the blocked all-pairs is replaced by
    minhash_candidate_pairs + the same verify step).
    """
    s = shingle_sets(docs.select(text_col, block_col, "doc_id"), n, text_col)
    blocked = s.join(
        docs.select("doc_id", F.col(block_col).alias("block")), "doc_id"
    )
    a = blocked.select(
        F.col("block"),
        F.col("doc_id").alias("id_a"),
        F.col("shingles").alias("sh_a"),
    )
    b = blocked.select(
        F.col("block"),
        F.col("doc_id").alias("id_b"),
        F.col("shingles").alias("sh_b"),
    )
    pairs = a.join(b, "block").where(F.col("id_a") < F.col("id_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return pairs.select(
        "id_a",
        "id_b",
        (inter / union).alias("jaccard"),
    ).where(F.col("jaccard") >= threshold)


# 31-bit Mersenne prime: (a·x + b) products of 31-bit operands fit in int64,
# so the permutation hashing stays in vectorized numpy integer arithmetic
# (the same scheme Spark MLlib's MinHashLSH uses with prime 2038074743).
MINHASH_PRIME = (1 << 31) - 1


def _hash_params(num_hashes: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MINHASH_PRIME, size=num_hashes, dtype=np.int64)
    b = rng.integers(0, MINHASH_PRIME, size=num_hashes, dtype=np.int64)
    return a, b


def minhash_signatures(
    shingled: DataFrame, num_hashes: int = 64
) -> DataFrame:
    """(doc_id, shingles) → (doc_id, signature array<long>).

    Vectorized inside Arrow batches: one numpy broadcast per document
    computes all ``num_hashes`` permutation minima over the shingle hash
    values ((a·x + b) mod p universal hashing, p = 2^31 - 1; shingles are
    crc32-hashed — C-speed and stable across executors, unlike python
    ``hash`` which is per-process salted)."""
    a, b = _hash_params(num_hashes, MINHASH_SEED)

    def _sign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from zlib import crc32

        for pdf in batches:
            sigs = []
            for sh in pdf["shingles"]:
                hv = np.fromiter(
                    (crc32(s.encode("utf-8")) & 0x7FFFFFFF for s in sh),
                    dtype=np.int64,
                    count=len(sh),
                )
                prod = (hv[None, :] * a[:, None] + b[:, None]) % MINHASH_PRIME
                sigs.append(prod.min(axis=1))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "signature": sigs})

    return shingled.mapInPandas(_sign, schema="doc_id long, signature array<long>")


def _fnv1a64(s: str) -> int:
    h = 0xCBF29CE484222325
    for byte in s.encode("utf-8"):
        h ^= byte
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def minhash_band_rows(
    signatures: DataFrame, bands: int = 16
) -> DataFrame:
    """(doc_id, signature) → one (doc_id, band_idx, band_hash) row per band.

    Band hashes are computed inside the same Arrow pass as the signatures
    live in (crc32 over the band's int64 bytes — C-speed, stable across
    executors). Keeping this in numpy instead of a nested JVM
    transform/slice expression avoids a multi-second whole-stage-codegen
    compile of a giant generated class (measured 20 s first-run overhead)."""

    def _band(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from zlib import crc32

        for pdf in batches:
            out_doc: list[int] = []
            out_idx: list[int] = []
            out_hash: list[int] = []
            for doc_id, sig in zip(pdf["doc_id"], pdf["signature"]):
                arr = np.asarray(sig, dtype=np.int64)
                r = max(len(arr) // bands, 1)
                for b in range(bands):
                    out_doc.append(doc_id)
                    out_idx.append(b)
                    out_hash.append(crc32(arr[b * r : (b + 1) * r].tobytes()))
            yield pd.DataFrame(
                {"doc_id": out_doc, "band_idx": out_idx, "band_hash": out_hash}
            )

    return signatures.mapInPandas(
        _band, schema="doc_id long, band_idx int, band_hash long"
    )


def minhash_candidate_pairs(
    signatures: DataFrame, bands: int = 16
) -> DataFrame:
    """LSH banding: one row per (doc, band), bucket self-join on
    (band index, band hash). The fan-out is 1→bands (bounded) and the join
    shuffles one small row per (doc, band) — linear in corpus size; buckets
    with a single member produce no pairs. Same shape as the simhash chunk
    join; AQE's skew-join split is the backstop for a degenerate hot bucket.
    """
    banded = minhash_band_rows(signatures, bands)
    a = banded.select("band_idx", "band_hash", F.col("doc_id").alias("id_a"))
    b = banded.select("band_idx", "band_hash", F.col("doc_id").alias("id_b"))
    return (
        a.join(b, ["band_idx", "band_hash"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_near_dup_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    text_col: str = "text",
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: candidates from banding, then
    exact-jaccard verification of candidates only (LSH gives recall, the
    verify step restores precision)."""
    # shingles feed three consumers (signatures + both sides of the verify
    # join); persist so the shingle expression runs once per partition, not
    # three times (at scale this is a checkpoint of a derived column set)
    shingled = shingle_sets(docs, n, text_col).persist()
    sigs = minhash_signatures(shingled, num_hashes)
    cands = minhash_candidate_pairs(sigs, bands)
    verified = (
        cands.join(
            shingled.select(
                F.col("doc_id").alias("id_a"), F.col("shingles").alias("sh_a")
            ),
            "id_a",
        )
        .join(
            shingled.select(
                F.col("doc_id").alias("id_b"), F.col("shingles").alias("sh_b")
            ),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            (
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b"))
            ).alias("jaccard"),
        )
    )
    return verified.where(F.col("jaccard") >= threshold)


def simhash_signatures(
    docs: DataFrame, text_col: str = "text", bits: int = 64
) -> DataFrame:
    """64-bit SimHash per document, vectorized numpy over Arrow batches."""

    bit_idx = np.arange(bits, dtype=np.uint64)

    def _sim(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for text in pdf[text_col]:
                words = text.split(" ")
                hv = np.fromiter(
                    (_fnv1a64(w) for w in words), dtype=np.uint64, count=len(words)
                )
                # (n_words, bits) bit matrix → per-bit ±1 vote sums, one
                # vectorized pass per document
                bitmat = (hv[:, None] >> bit_idx[None, :]) & 1
                acc = (2 * bitmat.astype(np.int64) - 1).sum(axis=0)
                sig = int(((acc > 0).astype(np.uint64) << bit_idx).sum())
                out.append(np.int64(sig - (1 << 64) if sig >= (1 << 63) else sig))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "simhash": out})

    return docs.select("doc_id", text_col).mapInPandas(
        _sim, schema="doc_id long, simhash long"
    )


def simhash_near_dup_pairs(
    docs: DataFrame, max_hamming: int = 3, text_col: str = "text"
) -> DataFrame:
    """SimHash near-dup: band the 64-bit signature into 4 16-bit chunks
    (pigeonhole: hamming ≤ 3 ⇒ at least one identical chunk), bucket-join on
    chunk value, verify with JVM ``bit_count(xor)``."""
    sigs = simhash_signatures(docs, text_col)
    chunks = sigs.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), i * 16).bitwiseAND(F.lit(0xFFFF))
                    for i in range(4)
                ]
            )
        ).alias("chunk_idx", "chunk_val"),
    )
    a = chunks.select(
        "chunk_idx",
        "chunk_val",
        F.col("doc_id").alias("id_a"),
        F.col("simhash").alias("sig_a"),
    )
    b = chunks.select(
        "chunk_idx",
        "chunk_val",
        F.col("doc_id").alias("id_b"),
        F.col("simhash").alias("sig_b"),
    )
    cands = (
        a.join(b, ["chunk_idx", "chunk_val"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .distinct()
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return cands.select("id_a", "id_b", hamming.alias("hamming")).where(
        F.col("hamming") <= max_hamming
    )
