"""Structured Streaming incremental extraction: exactly-once over crawl
segments via the file-source checkpoint, shared code path with batch.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ocr_project_spark.streaming.incremental import extract_stream


def _write_segment(pages, path, lo, hi):
    pages.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)).coalesce(
        1
    ).write.mode("append").parquet(path)


def test_incremental_extraction_exactly_once(spark, pages, documents, tmp_path):
    inp = str(tmp_path / "segments")
    out = str(tmp_path / "results")
    ckpt = str(tmp_path / "ckpt")

    # segment 1 lands → drain
    _write_segment(pages, inp, 0, 200)
    q = extract_stream(spark, inp, out, ckpt)
    q.awaitTermination(120)
    n1 = spark.read.parquet(out).count()
    assert n1 == pages.where("doc_id < 200").count()

    # segment 2 lands → drain again with the same checkpoint: only new files
    _write_segment(pages, inp, 200, 10_000)
    q = extract_stream(spark, inp, out, ckpt)
    q.awaitTermination(120)
    final = spark.read.parquet(out)
    assert final.count() == pages.count()
    # exactly-once: no url processed twice
    assert final.groupBy("url").count().where("count > 1").count() == 0

    # and the streamed results carry the same byte-identity invariant
    joined = final.where("success").join(
        documents.select("doc_id", F.col("text").alias("truth")), "doc_id"
    )
    assert joined.where(F.col("text") != F.col("truth")).count() == 0


def test_incremental_extraction_with_lineage(spark, pages, tmp_path):
    """Streaming lineage: each micro-batch appends per-(partition, backend)
    lineage rows stamped with its batch_id; re-draining with the same
    checkpoint processes nothing new."""
    from ocr_project_spark.streaming.incremental import extract_stream_with_lineage

    inp = str(tmp_path / "segments")
    out = str(tmp_path / "results")
    lin = str(tmp_path / "lineage")
    ckpt = str(tmp_path / "ckpt")

    _write_segment(pages, inp, 0, 200)
    q = extract_stream_with_lineage(spark, inp, out, lin, ckpt)
    q.awaitTermination(120)
    lineage1 = spark.read.parquet(lin)
    batches1 = {r["batch_id"] for r in lineage1.select("batch_id").distinct().collect()}
    n_docs1 = lineage1.agg(F.sum("n_docs")).collect()[0][0]
    assert n_docs1 == pages.where("doc_id < 200").count()

    _write_segment(pages, inp, 200, 10_000)
    q = extract_stream_with_lineage(spark, inp, out, lin, ckpt)
    q.awaitTermination(120)
    lineage2 = spark.read.parquet(lin)
    batches2 = {r["batch_id"] for r in lineage2.select("batch_id").distinct().collect()}
    assert batches2 > batches1  # new batch ids appended, old retained
    assert lineage2.agg(F.sum("n_docs")).collect()[0][0] == pages.count()
    assert spark.read.parquet(out).count() == pages.count()

    # drain again with nothing new: no extra lineage
    q = extract_stream_with_lineage(spark, inp, out, lin, ckpt)
    q.awaitTermination(120)
    assert spark.read.parquet(lin).count() == lineage2.count()


def test_dedup_stream_drops_recrawls(spark, pages, tmp_path):
    """Watermarked streaming dedup: a second segment recrawling the same
    urls (newer ts, inside the watermark) adds nothing."""
    from ocr_project_spark.streaming.incremental import dedup_stream

    inp = str(tmp_path / "segments")
    out = str(tmp_path / "dedup")
    ckpt = str(tmp_path / "ckpt")

    subset = pages.where("doc_id < 300")
    subset.coalesce(1).write.mode("append").parquet(inp)
    q = dedup_stream(spark, inp, out, ckpt)
    q.awaitTermination(120)
    n1 = spark.read.parquet(out).count()
    assert n1 == subset.count()

    # recrawl: same urls, 10 minutes later (inside the 1h watermark)
    recrawl = subset.withColumn(
        "warc_ts", F.col("warc_ts") + F.expr("INTERVAL 600 SECONDS")
    )
    recrawl.coalesce(1).write.mode("append").parquet(inp)
    q = dedup_stream(spark, inp, out, ckpt)
    q.awaitTermination(120)
    final = spark.read.parquet(out)
    assert final.count() == n1
    assert final.groupBy("url").count().where("count > 1").count() == 0


def test_host_totals_stateful_stream(spark, pages, tmp_path):
    """applyInPandasWithState: per-host running totals accumulate across
    micro-batches and across RESTARTS (state restored from checkpoint)."""
    inp = str(tmp_path / "segments")
    ckpt = str(tmp_path / "ckpt")
    from ocr_project_spark.streaming.incremental import host_totals_stream

    totals = str(tmp_path / "totals")
    _write_segment(pages, inp, 0, 200)
    q = host_totals_stream(spark, inp, totals, ckpt)
    q.awaitTermination(120)

    _write_segment(pages, inp, 200, 10_000)
    q = host_totals_stream(spark, inp, totals, ckpt)
    q.awaitTermination(120)
    # latest update per host reflects the FULL corpus (state crossed the
    # restart); take the max emitted running total per host
    got = {
        r["host"]: r["n_urls"]
        for r in spark.read.parquet(totals)
        .groupBy("host")
        .agg(F.max("n_urls").alias("n_urls"))
        .collect()
    }
    from ocr_project_spark.operators.skew import with_host

    expected = {
        r["host"]: r["count"]
        for r in with_host(pages).groupBy("host").count().collect()
    }
    assert got == expected
