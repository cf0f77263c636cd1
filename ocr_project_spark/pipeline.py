"""End-to-end extraction pipeline (SURVEY §3.1 "Spark rebuild" plan):

    read pages → validate/dispatch → anti-join resume → salted repartition
    → mapInPandas extraction → results + lineage sinks

One logical plan; Catalyst handles staging. The only shuffles are the
(optional) salted repartition and the resume anti-join — extraction itself
is narrow and the lineage aggregation is a partial-agg-friendly groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ocr_project_spark.operators.extract import extract_documents
from ocr_project_spark.operators.lineage import lineage_rows
from ocr_project_spark.operators.resume import completed_urls, resume_filter
from ocr_project_spark.operators.skew import salted_repartition


def run_extraction(
    pages: DataFrame,
    num_partitions: int | None = None,
    model_loaded: dict | None = None,
    repartition: bool = True,
) -> DataFrame:
    """pages → unified results DataFrame (lazy; caller writes/aggregates)."""
    if repartition and num_partitions:
        pages = salted_repartition(pages, num_partitions)
    return extract_documents(pages, model_loaded=model_loaded)


def run_job(
    spark: SparkSession,
    pages: DataFrame,
    results_path: str,
    lineage_path: str | None = None,
    num_partitions: int | None = None,
    max_records_per_file: int | None = 500_000,
) -> None:
    """Resumable batch job: skip completed urls, extract, append results and
    lineage. Crash-and-rerun converges to the same result set (see
    tests/test_resume.py). ``max_records_per_file`` bounds output file sizes
    so the results table stays scan-friendly at 100 TB (no multi-GB files
    from fat partitions, no planner pressure from tiny ones)."""
    done = completed_urls(spark, results_path)
    todo = resume_filter(pages, done)
    results = run_extraction(todo, num_partitions=num_partitions)
    writer = results.write.mode("append")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(results_path)
    if lineage_path:
        written = spark.read.parquet(results_path)
        lineage_rows(written).write.mode("overwrite").parquet(lineage_path)
