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
