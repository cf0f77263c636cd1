"""Lineage emission and health rollup (SURVEY §2.2 R3/R5/R6).

The reference polls live ``/health`` endpoints and keeps consecutive-failure
counters (reference: orchestrator/server.py:60-109, 339-380); the batch
analog is a lineage table — one row per (partition, backend) with doc/byte
counts — and plain aggregations over it. Partial aggregation (map-side
combine) comes free from Catalyst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Health rollup thresholds: the reference marks a backend unhealthy after 3
# consecutive failures and healthy after 2 passes (orchestrator/config.py:38-42);
# the batch analog grades the failure *rate* of the completed run.
DEGRADED_RATE = 0.01
UNHEALTHY_RATE = 0.5

# R3 circuit-breaker state machine constants (orchestrator/config.py:40-41).
FAILURE_THRESHOLD = 3  # consecutive failures before marking unhealthy
SUCCESS_THRESHOLD = 2  # consecutive successes before marking healthy


def lineage_rows(results: DataFrame) -> DataFrame:
    """Per-(partition, backend) lineage: doc count, success/failure split,
    extracted byte count. ``spark_partition_id`` identifies the input split —
    the extraction operator is narrow, so result partitions are input splits.
    """
    return (
        results.withColumn("part_id", F.spark_partition_id())
        .groupBy("part_id", "backend")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("success").cast("long")).alias("n_success"),
            F.sum((~F.col("success")).cast("long")).alias("n_failed"),
            F.sum("n_bytes").alias("n_bytes"),
            # P8 analog: summed per-doc kernel seconds per split (wall-clock
            # metrics live in lineage, not per-row identity checks)
            F.sum("processing_time").alias("cpu_seconds"),
        )
    )


def health_rollup(lineage: DataFrame) -> DataFrame:
    """R5 — per-backend status from lineage counts (the all/any rollup of
    orchestrator/server.py:361-365 re-expressed as a rate-graded agg)."""
    agg = lineage.groupBy("backend").agg(
        F.sum("n_docs").alias("n_docs"),
        F.sum("n_success").alias("n_success"),
        F.sum("n_failed").alias("n_failed"),
        F.sum("n_bytes").alias("n_bytes"),
    )
    fail_rate = F.col("n_failed") / F.col("n_docs")
    return agg.withColumn(
        "status",
        F.when(fail_rate >= UNHEALTHY_RATE, F.lit("unhealthy"))
        .when(fail_rate > DEGRADED_RATE, F.lit("degraded"))
        .otherwise(F.lit("healthy")),
    )


def circuit_breaker_gate(lineage: DataFrame) -> dict[str, bool]:
    """R3 circuit-breaker analog: replay the reference's per-backend health
    state machine (orchestrator/server.py:85-109 consecutive-failure
    counters, thresholds orchestrator/config.py:38-42) over a prior run's
    lineage, partition order standing in for poll order. A partition with
    zero successes and ≥1 failure is a failed health check; a backend whose
    trailing run reaches ``FAILURE_THRESHOLD`` consecutive failed partitions
    trips open (skipped — its next-run rows short-circuit to the
    model-not-loaded shape) and closes again after ``SUCCESS_THRESHOLD``
    consecutive healthy partitions. With the incremental lineage table
    (one append per run, stamped with a monotone ``run_id``), the replay
    walks (run_id, part_id) order — so healthy half-open-probe partitions
    appended by a later breaker-enabled run close the breaker without any
    manual intervention.

    Driver-side by design and bounded: the input is the per-(partition,
    backend) rollup — thousands of rows at 100 TB, never document data —
    and the output is the ``model_loaded`` gate for the next run.
    """
    has_run = "run_id" in lineage.columns
    cols = (["run_id"] if has_run else []) + [
        "backend",
        "part_id",
        "n_success",
        "n_failed",
    ]
    rows = lineage.select(*cols).collect()
    by_backend: dict[str, list] = {}
    for r in rows:
        key = (r["run_id"], r["part_id"]) if has_run else (r["part_id"],)
        by_backend.setdefault(r["backend"], []).append(
            key + (r["n_success"], r["n_failed"])
        )
    gate: dict[str, bool] = {}
    for backend, parts in by_backend.items():
        parts.sort()
        state_open = False
        consec_fail = 0
        consec_ok = 0
        for row in parts:
            n_success, n_failed = row[-2], row[-1]
            if n_success == 0 and n_failed > 0:
                consec_fail += 1
                consec_ok = 0
                if consec_fail >= FAILURE_THRESHOLD:
                    state_open = True
            else:
                consec_ok += 1
                consec_fail = 0
                if consec_ok >= SUCCESS_THRESHOLD:
                    state_open = False
        gate[backend] = not state_open
    return gate


def backend_listing(spark, lineage: DataFrame | None = None) -> DataFrame:
    """R6 — enumerate the backend registry, optionally joined with lineage
    aggregates (reference: orchestrator/server.py:383-415)."""
    from ocr_project_spark.kernels.registry import BACKEND_REGISTRY

    registry = spark.createDataFrame(
        [(name, fn.__doc__.splitlines()[0] if fn.__doc__ else "") for name, fn in BACKEND_REGISTRY.items()],
        "backend string, description string",
    )
    if lineage is None:
        return registry
    return registry.join(F.broadcast(health_rollup(lineage)), "backend", "left")
