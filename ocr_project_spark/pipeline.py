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
from ocr_project_spark.operators.resume import (
    completed_urls,
    read_parquet_if_exists,
    resume_filter,
)
from ocr_project_spark.operators.skew import salted_repartition

# Half-open circuit-breaker probe: while a backend's breaker is open, urls
# with crc32(url) % HALF_OPEN_PROBE_MOD == 0 (a deterministic ~1/16 sample,
# a pure function of the url — never rand()) still run its kernel each
# breaker-enabled pass, so recovery evidence can re-enter the lineage and
# close the breaker without an operator manually disabling it.
HALF_OPEN_PROBE_MOD = 16


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


def this_run_results(
    spark: SparkSession, results_path: str, run_id: int
) -> DataFrame:
    """Read back ONLY one run's rows from the results table: the run_id
    equality predicate pushes into the parquet scan, and every file written
    by another run is skipped on its row-group statistics (min = max =
    that run's id) — so the per-run lineage pass costs I/O proportional to
    the RUN, not to the accumulated 100 TB results table
    (plan-asserted in tests/test_plans.py)."""
    return spark.read.parquet(results_path).where(F.col("run_id") == run_id)


def _next_run_id(lineage_prior: DataFrame | None) -> int:
    """Deterministic monotone run counter derived from the (tiny) lineage
    table — never wall-clock or random (resume determinism).

    The counter deliberately reads lineage, not the results table (that
    would re-scan accumulated output): if a run crashes AFTER its results
    append but BEFORE its lineage append, the rerun reuses the same
    run_id and its lineage pass aggregates the crashed run's rows along
    with its own — which is convergent, not double-counted, because the
    crashed run never wrote lineage for those rows and the resume
    anti-join prevents re-extracting them."""
    if lineage_prior is None or "run_id" not in lineage_prior.columns:
        return 0
    prev = lineage_prior.agg(F.max("run_id")).collect()[0][0]
    return 0 if prev is None else int(prev) + 1


def run_job(
    spark: SparkSession,
    pages: DataFrame,
    results_path: str | None,
    lineage_path: str | None = None,
    num_partitions: int | None = None,
    max_records_per_file: int | None = 500_000,
    circuit_breaker: bool = False,
    probe_mod: int = HALF_OPEN_PROBE_MOD,
    bucketed_table: str | None = None,
    buckets: int = 64,
) -> None:
    """Resumable batch job: skip completed urls, extract, append results and
    lineage. Crash-and-rerun converges to the same result set (see
    tests/test_resume.py). ``max_records_per_file`` bounds output file sizes
    so the results table stays scan-friendly at 100 TB (no multi-GB files
    from fat partitions, no planner pressure from tiny ones).

    Lineage is INCREMENTAL: each run stamps its rows with a monotone
    ``run_id``, reads back only its own rows (parquet row-group stats skip
    every other run's files), and APPENDS its per-(partition, backend)
    lineage — the accumulated results table is never re-scanned, and
    ``health_rollup`` aggregates the appends (it already partial-aggs).

    ``circuit_breaker=True`` replays the accumulated lineage through the R3
    health state machine (operators/lineage.circuit_breaker_gate) and
    short-circuits a tripped backend's rows to the model-not-loaded shape
    instead of running its kernel — EXCEPT a deterministic ~1/``probe_mod``
    url sample (the half-open probe), which still runs so the breaker can
    observe recovery and close itself: probe successes are real results
    (checkpointed + healthy lineage), probe failures are treated as
    infrastructure evidence — lineage only, never checkpointed, so the urls
    retry once the backend recovers.

    ``bucketed_table`` switches the results store from a plain parquet
    directory to a url-bucketed catalog table (PLANS §2b): each run's
    append keeps rows hash-clustered on the resume key, so the next run's
    anti-join reads the (at scale, enormous) done side pre-partitioned —
    the done-side exchange disappears from the plan entirely. When set,
    ``results_path`` is ignored (pass None); ``buckets`` should match the
    pages side's shuffle parallelism. Identical resume/convergence
    semantics either way (tests/test_resume.py runs the crash/rerun/noop
    suite against both stores)."""
    lineage_prior = (
        read_parquet_if_exists(spark, lineage_path) if lineage_path else None
    )
    model_loaded = None
    if circuit_breaker and lineage_prior is not None:
        from ocr_project_spark.operators.lineage import circuit_breaker_gate

        model_loaded = circuit_breaker_gate(lineage_prior)
    run_id = _next_run_id(lineage_prior)
    if bucketed_table is not None:
        from ocr_project_spark.operators.resume import completed_urls_bucketed

        done = completed_urls_bucketed(spark, bucketed_table)
    else:
        done = completed_urls(spark, results_path)
    todo = resume_filter(pages, done)

    from ocr_project_spark.contract import ERR_MODEL_NOT_LOADED

    probe_results = None
    probe_fail_lineage = None
    tripped = [b for b, ok in (model_loaded or {}).items() if not ok]
    parts: list[DataFrame] = []
    if tripped and probe_mod:
        is_probe = F.col("backend").isin(tripped) & (
            F.crc32(F.col("url")) % probe_mod == 0
        )
        # the probe set is bounded (~todo/probe_mod of the tripped backend
        # only), so persisting it for the dual success/failure use is cheap.
        # Probe FAILURES are deliberately infra evidence, never checkpointed
        # results: under an open breaker a failure cannot be attributed to
        # the document (the reference's down-backend errors mask document
        # status), so the url stays retryable until the breaker closes —
        # the trade-off is that a genuinely-malformed probe doc re-probes
        # each breaker-open run (bounded by probe_mod) until recovery.
        probe_results = run_extraction(
            todo.where(is_probe), num_partitions=num_partitions
        ).persist()
        parts.append(probe_results.where(F.col("success")))
        probe_fail_lineage = lineage_rows(probe_results.where(~F.col("success")))
        todo = todo.where(~is_probe)

    rest = run_extraction(
        todo, num_partitions=num_partitions, model_loaded=model_loaded
    )
    # Model-not-loaded is an *infrastructure* condition (breaker open /
    # backend down), not a property of the document — checkpointing such a
    # row would permanently exclude the url from re-extraction because
    # completed_urls marks every written url done. Skipped rows are simply
    # not appended, so the next run with a healthy backend retries exactly
    # those urls and the result set converges (tests/test_pipeline.py
    # breaker recovery tests). Document-level failures (malformed payload,
    # invalid backend/mode) ARE results and stay checkpointed.
    rest = rest.where(
        F.col("error").isNull() | (F.col("error") != F.lit(ERR_MODEL_NOT_LOADED))
    )
    parts.append(rest)
    results = parts[0]
    for extra in parts[1:]:
        results = results.unionByName(extra)
    results = results.withColumn("run_id", F.lit(run_id).cast("long"))

    try:
        if bucketed_table is not None:
            from ocr_project_spark.operators.resume import write_results_bucketed

            write_results_bucketed(
                results, bucketed_table, buckets, max_records_per_file
            )
        else:
            writer = results.write.mode("append")
            if max_records_per_file:
                writer = writer.option("maxRecordsPerFile", max_records_per_file)
            writer.parquet(results_path)
        if lineage_path:
            this_run = (
                spark.table(bucketed_table).where(F.col("run_id") == run_id)
                if bucketed_table is not None
                else this_run_results(spark, results_path, run_id)
            )
            lin = lineage_rows(this_run)
            if probe_fail_lineage is not None:
                lin = lin.unionByName(probe_fail_lineage)
            lin.withColumn("run_id", F.lit(run_id).cast("long")).write.mode(
                "append"
            ).parquet(lineage_path)
    finally:
        if probe_results is not None:
            probe_results.unpersist()
