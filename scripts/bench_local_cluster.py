#!/usr/bin/env python
"""Multi-process scale-out evidence (round-3 verdict stretch item): run the
identical north-rule extraction job under local[N] (one JVM, N threads) and
local-cluster[W,C,mem] (W separate executor JVMs × C cores — real
serialization/network boundaries between driver and executors, the closest
this sandbox gets to adding machines), same total core count, and report
throughput for both.

Usage: python scripts/bench_local_cluster.py [sf_dir] [replicate]
Prints one JSON line; the shipping numbers live in BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402


def build(master: str, workers_mem: str | None = None) -> SparkSession:
    b = (
        SparkSession.builder.master(master)
        .appName("bench-local-cluster")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        # executor JVMs need the repo on their Python workers' path
        .config("spark.executorEnv.PYTHONPATH", os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    )
    if workers_mem:
        b = b.config("spark.executor.memory", workers_mem)
    return b.getOrCreate()


def run_leg(master: str, sf_dir: str, pages_path: str, warm_path: str) -> dict:
    from ocr_project_spark.pipeline import run_extraction

    spark = build(master, workers_mem="6g" if "local-cluster" in master else None)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    truth = docs.select("doc_id", F.col("text").alias("truth")).cache()
    truth.count()
    n_docs = spark.read.parquet(pages_path).count()

    def one(path):
        t0 = time.monotonic()
        pages = spark.read.parquet(path)
        res = run_extraction(pages, num_partitions=16)
        row = (
            res.withColumn("base_doc_id", F.col("doc_id") % 1_000_000)
            .join(F.broadcast(truth), F.col("base_doc_id") == truth.doc_id)
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(
                    (F.col("success") & (res.text == F.col("truth"))).cast("long")
                ).alias("identical"),
            )
            .collect()[0]
        )
        return time.monotonic() - t0, row

    one(warm_path)  # untimed: codegen + worker spawn
    best = None
    for _ in range(2):
        seconds, row = one(pages_path)
        assert row["n"] == n_docs
        if best is None or seconds < best[0]:
            best = (seconds, row)
    spark.stop()
    return {
        "master": master,
        "seconds": round(best[0], 2),
        "n_docs": n_docs,
        "docs_per_sec": round(n_docs / best[0], 1),
        "identical_frac": round(best[1]["identical"] / best[1]["n"], 4),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    replicate = int(sys.argv[2]) if len(sys.argv) > 2 else 24

    from ocr_project_spark.datagen import synthesize_pages
    from ocr_project_spark.session import build_session

    d = tempfile.mkdtemp(prefix="bench_lc_")
    pages_path = os.path.join(d, "pages.parquet")
    warm_path = os.path.join(d, "warm.parquet")
    prep = build_session(master="local[8]", app_name="bench-lc-prep")
    prep.sparkContext.setLogLevel("ERROR")
    synthesize_pages(prep, sf_dir, replicate=replicate, num_partitions=32).write.mode(
        "overwrite"
    ).parquet(pages_path)
    synthesize_pages(prep, sf_dir, replicate=1, num_partitions=8).write.mode(
        "overwrite"
    ).parquet(warm_path)
    prep.stop()

    legs = [
        run_leg("local[8]", sf_dir, pages_path, warm_path),
        run_leg("local-cluster[4,2,8192]", sf_dir, pages_path, warm_path),
    ]
    ratio = round(legs[1]["docs_per_sec"] / legs[0]["docs_per_sec"], 3)
    print(
        json.dumps(
            {
                "legs": legs,
                "cluster_vs_threads_ratio": ratio,
                "note": "same 8 total cores; local-cluster adds real "
                "driver↔executor serialization boundaries (4 separate "
                "executor JVMs × 2 cores) — the sandbox's closest proxy "
                "for multi-machine execution",
            }
        )
    )

    import shutil

    shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
