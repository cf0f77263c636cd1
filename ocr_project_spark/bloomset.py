"""Bloom-filter seen-sets for cross-snapshot exact dedup (training-data
pipeline).

The published recipe (Soldaini et al. 2024, "Dolma" — Bloom-filter
paragraph/document dedup; Bloom 1970): when a new crawl snapshot must be
deduplicated against *every document ever kept*, the exact seen-set is
billions of keys and an anti-join against it re-shuffles the full history
every increment. A Bloom filter compresses the seen-set into a fixed bit
array with a bounded false-positive rate and **zero false negatives** —
"probably seen" may over-fire (drops a few novel docs, harmless for
training data), "not seen" is always exact.

Engine mapping — the filter is a *DataFrame*, not driver state:

- **build**: every key hashes to ``k_probes`` bit positions
  (md5-derived, the same ``conv(substr(md5(..),1,15),16,10)`` idiom as
  :func:`~ocr_project_spark.textops.hash_split`, so a SQL oracle replays
  every position); positions group into 32-bit words and a ``bit_or``
  aggregation ORs the masks — map-side partial aggregation does almost
  all the work, and the result is ``m_bits/32`` rows of
  ``(word_idx, bits)``. Filters built from different snapshots **merge
  by unioning and re-bit_or-ing** — the aggregation is commutative, so
  the seen-set accretes incrementally without ever rebuilding.
- **probe**: the filter table broadcasts (2⁷ bits/key at a 1%% FP target
  ⇒ ~1.6 GB for 10⁹ keys — a broadcastable object where the raw key set
  is not), each candidate key explodes into its ``k_probes``
  ``(word_idx, mask)`` rows, a broadcast-hash left join pulls the filter
  words, and ``probably_seen`` = all ``k_probes`` masks present. The only
  exchange is the per-key rollup of ``k_probes`` 16-byte rows; the
  payloads never shuffle. Beyond broadcast reach, range-shard the filter
  on ``word_idx`` and co-partition probes the same way.

Determinism: positions are a pure function of ``(salt, probe_index,
key)`` — no RNG, no partitioning dependence — so build and probe are
replayable byte-for-byte in SQL (the ``bloom_seen`` driver oracle
rebuilds the filter and every probe in DuckDB and cross-checks both the
flags and the false-positive accounting).

Bit layout uses 32-bit words (``1 << (pos % 32)`` stays positive in
every engine; 64-bit masks would hit signed-shift edge cases in SQL
replays).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

WORD_BITS = 32


def _mask() -> Column:
    """``1 << (pos % 32)`` as a SQL expr (shiftleft's distance must be a
    column here, which the Python ``F.shiftleft`` wrapper rejects)."""
    return F.expr(
        f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {WORD_BITS} AS INT))"
    )


def _positions(key: Column, k_probes: int, m_bits: int, salt: str) -> Column:
    """Array of ``k_probes`` bit positions for a key — md5 of
    ``salt#i#key`` per probe, hex-prefix parsed to a 60-bit int, mod
    ``m_bits``. Pure JVM expression; exactly replayable in SQL."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(k_probes - 1)),
        lambda i: (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit(salt),
                            F.lit("#"),
                            i.cast("string"),
                            F.lit("#"),
                            key,
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % m_bits
        ),
    )


def bloom_build(
    keys: DataFrame,
    key_col: str = "key",
    m_bits: int = 1 << 20,
    k_probes: int = 4,
    salt: str = "bloom",
) -> DataFrame:
    """Build the filter table ``(word_idx long, bits long)`` from a key
    column. ``bit_or`` with map-side partial aggregation: the shuffle
    carries at most ``m_bits/32`` rows per map partition. Filters from
    successive snapshots merge with :func:`bloom_merge`."""
    pos = F.explode(_positions(F.col(key_col), k_probes, m_bits, salt)).alias(
        "pos"
    )
    return (
        # NULL keys insert nothing (they'd otherwise land one junk
        # (NULL, NULL) word row: concat nulls each position element, and
        # explode keeps the k null rows)
        keys.where(F.col(key_col).isNotNull())
        .select(pos)
        .select(
            (F.col("pos") / WORD_BITS).cast("long").alias("word_idx"),
            _mask().alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_merge(*filters: DataFrame) -> DataFrame:
    """OR together filters built with identical (m_bits, k_probes, salt) —
    the incremental-snapshot accretion path; never rebuild history."""
    if not filters:
        raise ValueError("bloom_merge requires at least one filter")
    out = filters[0]
    for f in filters[1:]:
        out = out.unionByName(f)
    return out.groupBy("word_idx").agg(F.bit_or("bits").alias("bits"))


def bloom_probe(
    candidates: DataFrame,
    bloom: DataFrame,
    key_col: str = "key",
    id_col: str = "doc_id",
    m_bits: int = 1 << 20,
    k_probes: int = 4,
    salt: str = "bloom",
) -> DataFrame:
    """Probe candidate keys against a filter: ``(id_col, probably_seen)``.

    ``probably_seen=false`` is exact (no false negatives);
    ``probably_seen=true`` is wrong with probability ≈ (1−e^{−kn/m})^k.
    The filter side broadcasts; the only exchange is the per-key rollup
    of its ``k_probes`` probe rows.

    A NULL key yields ``probably_seen=false`` (a null has definitionally
    never been inserted — ``bloom_build`` drops nulls): ``explode_outer``
    keeps the candidate's row where a plain ``explode`` would silently
    remove it from the output."""
    probes = candidates.select(
        F.col(id_col).alias(id_col),
        F.explode_outer(
            _positions(F.col(key_col), k_probes, m_bits, salt)
        ).alias("pos"),
    ).select(
        id_col,
        (F.col("pos") / WORD_BITS).cast("long").alias("word_idx"),
        _mask().alias("mask"),
    )
    joined = probes.join(F.broadcast(bloom), "word_idx", "left")
    # coalesce(.., false): a null-key row carries a null mask, which must
    # count as a miss, not poison the per-key sum with a null
    hit = F.coalesce(
        F.col("mask").bitwiseAND(F.coalesce(F.col("bits"), F.lit(0))) != 0,
        F.lit(False),
    ).cast("int")
    # min(hit) == 1, NOT sum(hit) == k_probes: a candidate id appearing
    # on multiple input rows (the same url captured twice in a snapshot)
    # would sum to a multiple of k_probes and report a FALSE NEGATIVE on
    # a definitely-seen key, breaking the module's one exact guarantee;
    # min is duplicate-invariant (probably_seen = every probe row hit)
    return (
        joined.groupBy(id_col)
        .agg(F.min(hit).alias("__min_hit"))
        .select(
            id_col,
            (F.col("__min_hit") == 1).alias("probably_seen"),
        )
    )


def bloom_dedup_against(
    candidates: DataFrame,
    seen_keys: DataFrame,
    key_col: str = "key",
    id_col: str = "doc_id",
    m_bits: int = 1 << 20,
    k_probes: int = 4,
    salt: str = "bloom",
) -> DataFrame:
    """One-shot convenience: build the filter from ``seen_keys`` and keep
    only the candidates whose key is definitely novel. At scale, persist
    the built filter (``m_bits/32`` rows) and accrete it with
    :func:`bloom_merge` instead of rebuilding per increment."""
    bloom = bloom_build(
        seen_keys, key_col=key_col, m_bits=m_bits, k_probes=k_probes, salt=salt
    )
    flags = bloom_probe(
        candidates,
        bloom,
        key_col=key_col,
        id_col=id_col,
        m_bits=m_bits,
        k_probes=k_probes,
        salt=salt,
    )
    # NO broadcast hint on the flags side: on a recrawl increment most
    # candidates are seen, so the flagged-id set is candidate-sized —
    # exactly the set the Bloom filter exists to avoid moving. A plain
    # left-anti shuffles only ids; AQE may still choose to broadcast it
    # when it measures small.
    return candidates.join(
        flags.where(F.col("probably_seen")).select(id_col),
        id_col,
        "left_anti",
    )
