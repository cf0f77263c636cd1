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


def test_near_dup_stream_cross_batch(spark, tmp_path):
    """Incremental near-dup: a copy arriving in a LATER micro-batch must
    pair with its original from an earlier batch via the accumulated band
    index, without re-banding old documents."""
    from ocr_project_spark.streaming.incremental import near_dup_stream

    inp = str(tmp_path / "docs")
    idx = str(tmp_path / "index")
    pairs_out = str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ckpt")

    base = " ".join(f"tok{i}" for i in range(60))
    far = " ".join(f"other{i}" for i in range(60))
    near = "edited " + " ".join(f"tok{i}" for i in range(1, 60))

    # batch 1: two exact copies (1, 2) + an unrelated doc (9)
    spark.createDataFrame(
        [(1, base, "en"), (2, base, "en"), (9, far, "en")],
        "doc_id long, text string, lang string",
    ).coalesce(1).write.mode("append").parquet(inp)
    q = near_dup_stream(spark, inp, idx, pairs_out, ckpt)
    q.awaitTermination(120)
    got1 = {(r["id_a"], r["id_b"]) for r in spark.read.parquet(pairs_out).collect()}
    assert got1 == {(1, 2)}

    # batch 2: a near-dup of doc 1 arrives hours later
    spark.createDataFrame(
        [(101, near, "en")], "doc_id long, text string, lang string"
    ).coalesce(1).write.mode("append").parquet(inp)
    q = near_dup_stream(spark, inp, idx, pairs_out, ckpt)
    q.awaitTermination(120)
    got2 = {(r["id_a"], r["id_b"]) for r in spark.read.parquet(pairs_out).collect()}
    assert (1, 101) in got2 and (2, 101) in got2
    assert (9, 101) not in got2
    # re-running with nothing new emits nothing (checkpoint exactly-once)
    q = near_dup_stream(spark, inp, idx, pairs_out, ckpt)
    q.awaitTermination(120)
    got3 = {(r["id_a"], r["id_b"]) for r in spark.read.parquet(pairs_out).collect()}
    assert got3 == got2
