"""Incremental-crawl extraction via Structured Streaming.

The reference is request/response and the north rule is pure batch (SURVEY
§7.4), so streaming is *optional* engine surface: the Spark-idiomatic way to
run the same extraction continuously as new crawl segments land. The file
source tracks processed files in the streaming checkpoint, giving
exactly-once over *segments* — complementary to the batch anti-join resume
(`operators/resume.py`), which dedupes at url granularity.

The transformation is the very same `extract_documents` Arrow-batch
operator — `mapInPandas` is streaming-compatible, so batch and streaming
share one code path (no semantic drift between the two).

`trigger(availableNow=True)` drains everything pending and stops — the
batch-job-shaped way to run an incremental pass (cron-friendly); drop the
trigger for a long-running continuous job on a cluster.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from ocr_project_spark.contract import PAGES_SCHEMA
from ocr_project_spark.operators.extract import extract_documents

# input schema: BASELINE.json input_hint columns + the datagen ride-alongs
STREAM_PAGES_SCHEMA = T.StructType(
    list(PAGES_SCHEMA.fields)
    + [
        T.StructField("doc_id", T.LongType()),
        T.StructField("backend", T.StringType()),
    ]
)


def extract_stream(
    spark: SparkSession,
    input_path: str,
    results_path: str,
    checkpoint_path: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Start the incremental extraction stream; returns the StreamingQuery.

    New parquet files appearing under ``input_path`` are extracted exactly
    once (file-source checkpoint) and appended to ``results_path``.
    """
    reader = spark.readStream.schema(STREAM_PAGES_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    pages = reader.parquet(input_path)
    results = extract_documents(pages)
    writer = (
        results.writeStream.format("parquet")
        .option("path", results_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def dedup_stream(
    spark: SparkSession,
    input_path: str,
    results_path: str,
    checkpoint_path: str,
    watermark: str = "1 hour",
    available_now: bool = True,
):
    """Streaming url-dedup: keep the first capture of each url across
    micro-batches, with state bounded by the event-time watermark
    (``dropDuplicatesWithinWatermark`` — a url recrawled within the
    watermark window is dropped; state for older urls is evicted, so the
    store never grows past one window of distinct urls). The streaming
    counterpart of the batch ``latest_capture``/resume pair for pipelines
    that must dedup before any results table exists."""
    pages = spark.readStream.schema(STREAM_PAGES_SCHEMA).parquet(input_path)
    deduped = pages.withWatermark("warc_ts", watermark).dropDuplicatesWithinWatermark(
        ["url"]
    )
    writer = (
        deduped.writeStream.format("parquet")
        .option("path", results_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def host_totals_stream(
    spark: SparkSession,
    input_path: str,
    totals_path: str,
    checkpoint_path: str,
    available_now: bool = True,
):
    """Custom stateful streaming operator (``applyInPandasWithState``):
    per-host running crawl totals that survive across micro-batches AND
    across restarts (state lives in the streaming checkpoint) — the live
    politeness/budget counter a continuous crawl consults. Each update
    emits the host's new running (n_urls, n_bytes), appended with its
    batch_id to ``totals_path`` via foreachBatch (the memory sink cannot
    recover from a checkpoint; a durable sink can)."""
    from typing import Any, Iterator as TIterator, Tuple

    import pandas as pd

    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    pages = spark.readStream.schema(STREAM_PAGES_SCHEMA).parquet(input_path)
    keyed = pages.select(
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.length("html").alias("n_bytes"),
    )

    def _update(
        key: Tuple[Any, ...],
        pdfs: TIterator[pd.DataFrame],
        state: GroupState,
    ) -> TIterator[pd.DataFrame]:
        n = 0
        b = 0
        for pdf in pdfs:
            n += len(pdf)
            b += int(pdf["n_bytes"].sum())
        prev_n, prev_b = state.get if state.exists else (0, 0)
        state.update((prev_n + n, prev_b + b))
        yield pd.DataFrame(
            {"host": [key[0]], "n_urls": [prev_n + n], "n_bytes": [prev_b + b]}
        )

    out = keyed.groupBy("host").applyInPandasWithState(
        _update,
        outputStructType="host string, n_urls long, n_bytes long",
        stateStructType="n_urls long, n_bytes long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

    def _sink(batch_df, batch_id: int) -> None:
        batch_df.withColumn("batch_id", F.lit(batch_id).cast("long")).write.mode(
            "append"
        ).parquet(totals_path)

    writer = (
        out.writeStream.foreachBatch(_sink)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_path)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def near_dup_stream(
    spark: SparkSession,
    input_path: str,
    index_path: str,
    pairs_path: str,
    checkpoint_path: str,
    threshold: float = 0.8,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    available_now: bool = True,
):
    """Incremental cross-batch near-dup detection: as new document files
    land, each micro-batch's MinHash band rows join against the
    ACCUMULATED index of every prior batch (plus the batch itself), verified
    candidates append to ``pairs_path``, and the batch's rows join the
    index — so a near-duplicate of a document ingested hours ago surfaces
    the moment its copy arrives, without re-banding the corpus.

    State lives in parquet (``index_path``: band rows + per-doc shingle-hash
    arrays), not executor memory — the index is corpus-sized and a stream
    restart resumes from the file-source checkpoint with the index intact.
    Verification uses exact Jaccard over the xxhash64 shingle-hash ARRAYS
    (persisting the hashes instead of the shingle strings keeps the index
    ~10× smaller; a 64-bit hash collision inflating a Jaccard is ~2⁻⁶⁴ —
    negligible against the 0.8 threshold). Delivery is foreachBatch's
    at-least-once: a mid-sink crash replays the batch, so the emitted
    ``batch_id`` column is the downstream dedup key (pairs themselves are
    idempotent values). Returns the StreamingQuery.
    """
    import os

    from pyspark.sql import functions as F

    from ocr_project_spark.dedup import (
        hashed_shingles,
        minhash_band_rows_from_hashes,
    )

    reader = spark.readStream.schema("doc_id long, text string, lang string")
    docs = reader.parquet(input_path)

    band_dir = os.path.join(index_path, "bands")
    hash_dir = os.path.join(index_path, "hashes")

    def _sink(batch_df, batch_id: int) -> None:
        sess = batch_df.sparkSession
        hashed = hashed_shingles(batch_df, n).localCheckpoint()
        banded = minhash_band_rows_from_hashes(
            hashed, num_hashes, bands
        ).localCheckpoint()
        have_index = os.path.exists(band_dir)
        index_bands = (
            sess.read.parquet(band_dir)
            if have_index
            else banded.limit(0)
        )
        # candidates = batch×batch (id_a < id_b) ∪ batch×index (index side
        # is always id_a: prior docs carry strictly older ingest order)
        b_a = banded.select(
            "band_idx", "band_hash", F.col("doc_id").alias("id_a")
        )
        b_b = banded.select(
            "band_idx", "band_hash", F.col("doc_id").alias("id_b")
        )
        intra = (
            b_a.join(b_b, ["band_idx", "band_hash"])
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
        )
        cross = (
            index_bands.select(
                "band_idx", "band_hash", F.col("doc_id").alias("id_a")
            )
            .join(b_b, ["band_idx", "band_hash"])
            .where(F.col("id_a") != F.col("id_b"))
            .select("id_a", "id_b")
        )
        cands = intra.unionByName(cross).distinct()
        all_hashes = (
            sess.read.parquet(hash_dir).unionByName(hashed)
            if have_index
            else hashed
        )
        ha = all_hashes.select(
            F.col("doc_id").alias("id_a"),
            F.array_distinct("hashes").alias("ha"),
        )
        hb = all_hashes.select(
            F.col("doc_id").alias("id_b"),
            F.array_distinct("hashes").alias("hb"),
        )
        verified = (
            cands.join(ha, "id_a")
            .join(hb, "id_b")
            .select(
                "id_a",
                "id_b",
                (
                    F.size(F.array_intersect("ha", "hb"))
                    / F.size(F.array_union("ha", "hb"))
                ).alias("jaccard"),
            )
            .where(F.col("jaccard") >= threshold)
        )
        verified.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(pairs_path)
        banded.write.mode("append").parquet(band_dir)
        hashed.write.mode("append").parquet(hash_dir)

    writer = docs.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def extract_stream_with_lineage(
    spark: SparkSession,
    input_path: str,
    results_path: str,
    lineage_path: str,
    checkpoint_path: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Incremental extraction that also emits per-micro-batch lineage rows
    (the streaming analog of the batch job's lineage sink): each micro-batch
    appends its results AND its per-(partition, backend) lineage rows
    stamped with the ``batch_id`` — the crawl-operations ledger that tells
    an operator which segment batch produced which doc/byte counts.

    Uses ``foreachBatch``: the file-source checkpoint still guarantees each
    segment is *read* once; a crash between the two appends inside one
    micro-batch can replay that batch (at-least-once within the batch),
    which downstream dedup handles by batch_id — the standard Spark
    trade-off for multi-sink streaming, documented rather than hidden.
    """
    from pyspark.sql import functions as F

    from ocr_project_spark.operators.lineage import lineage_rows

    reader = spark.readStream.schema(STREAM_PAGES_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    pages = reader.parquet(input_path)
    results = extract_documents(pages)

    def _sink(batch_df, batch_id: int) -> None:
        batch_df.persist()
        try:
            batch_df.write.mode("append").parquet(results_path)
            lineage_rows(batch_df).withColumn(
                "batch_id", F.lit(batch_id).cast("long")
            ).write.mode("append").parquet(lineage_path)
        finally:
            batch_df.unpersist()

    writer = results.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
