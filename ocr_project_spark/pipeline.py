"""End-to-end extraction pipeline (SURVEY §3.1 "Spark rebuild" plan):

    read pages → validate/dispatch → anti-join resume → salted repartition
    → mapInPandas extraction → results + lineage sinks

One logical plan; Catalyst handles staging. The only shuffles are the
(optional) salted repartition and the resume anti-join — extraction itself
is narrow and the lineage aggregation is a partial-agg-friendly groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

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
    circuit_breaker: bool = False,
) -> None:
    """Resumable batch job: skip completed urls, extract, append results and
    lineage. Crash-and-rerun converges to the same result set (see
    tests/test_resume.py). ``max_records_per_file`` bounds output file sizes
    so the results table stays scan-friendly at 100 TB (no multi-GB files
    from fat partitions, no planner pressure from tiny ones).

    ``circuit_breaker=True`` replays the prior run's lineage through the R3
    health state machine (operators/lineage.circuit_breaker_gate) and
    short-circuits any tripped backend's rows to the model-not-loaded shape
    instead of running its kernel."""
    model_loaded = None
    if circuit_breaker and lineage_path:
        import os

        from ocr_project_spark.operators.lineage import circuit_breaker_gate

        if os.path.exists(lineage_path):
            model_loaded = circuit_breaker_gate(
                spark.read.parquet(lineage_path)
            )
    done = completed_urls(spark, results_path)
    todo = resume_filter(pages, done)
    results = run_extraction(
        todo, num_partitions=num_partitions, model_loaded=model_loaded
    )
    # Model-not-loaded is an *infrastructure* condition (breaker open /
    # backend down), not a property of the document — checkpointing such a
    # row would permanently exclude the url from re-extraction because
    # completed_urls marks every written url done. Skipped rows are simply
    # not appended, so the next run with a healthy backend retries exactly
    # those urls and the result set converges (tests/test_pipeline.py run-#3
    # recovery test). Document-level failures (malformed payload, invalid
    # backend/mode) ARE results and stay checkpointed.
    from ocr_project_spark.contract import ERR_MODEL_NOT_LOADED

    results = results.where(
        F.col("error").isNull() | (F.col("error") != F.lit(ERR_MODEL_NOT_LOADED))
    )
    writer = results.write.mode("append")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(results_path)
    if lineage_path:
        written = spark.read.parquet(results_path)
        lineage_rows(written).write.mode("overwrite").parquet(lineage_path)
