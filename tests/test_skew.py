"""Skew-defusal tests (north rule: url-hash bucketing + salted repartition).

The datagen plants a hot host holding 30% of all urls; the salted
repartition must shatter it across partitions while keeping placement
deterministic across runs (required for resume).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_project_spark.datagen import HOT_HOST
from ocr_project_spark.operators.skew import hot_hosts, salted_repartition

N_PARTS = 8


def test_hot_host_detected(pages):
    hosts = [r["host"] for r in hot_hosts(pages).collect()]
    assert HOT_HOST in hosts


def test_salted_repartition_spreads_hot_host(pages):
    parts = salted_repartition(pages, N_PARTS)
    dist = (
        parts.withColumn("pid", F.spark_partition_id())
        .where(F.col("url").contains(HOT_HOST))
        .groupBy("pid")
        .count()
        .collect()
    )
    # the hot host (30% of rows) lands on >1 partition — without salt it
    # would collapse onto exactly one
    assert len(dist) > 1
    counts = [r["count"] for r in dist]
    assert max(counts) < sum(counts)  # no single partition holds it all


def test_salted_repartition_bounds_max_partition(pages):
    parts = salted_repartition(pages, N_PARTS)
    sizes = [
        r["count"]
        for r in parts.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
        .collect()
    ]
    total = sum(sizes)
    # the hot host alone is 30% of rows; salting must keep every partition
    # well under that (2× the ideal share as the bound)
    assert max(sizes) <= 2 * total / N_PARTS


def test_salted_repartition_deterministic(pages):
    def placement():
        return {
            r["url"]: r["pid"]
            for r in salted_repartition(pages, N_PARTS)
            .withColumn("pid", F.spark_partition_id())
            .select("url", "pid")
            .collect()
        }

    assert placement() == placement()


def test_salted_repartition_preserves_rows(pages):
    parts = salted_repartition(pages, N_PARTS)
    assert parts.count() == pages.count()
    assert set(parts.columns) == set(pages.columns)
