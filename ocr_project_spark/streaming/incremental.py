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
