"""Structured-Streaming wrapper of the extraction pipeline.

The reference is strictly batch (SURVEY.md §2.8) — its closest stream is the
append-only analytics log dir re-scanned on refresh (analytics.py:48-50).
This module is the Spark-native upgrade of that pattern: the SAME stateless
extract_documents transformation (columnar normalize + fused pandas UDF —
every stage is narrow/per-row, so it is streaming-legal without any state
store) bound to a file-source stream of document parquet drops, with exactly
-once progress via the checkpoint dir. A micro-batch is the streaming twin
of run_pipeline's wave: late-arriving document files are simply processed by
a later trigger.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..pipeline import extract_documents
from ..sources.corpus import SPANS_SCHEMA


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """documents parquet drops in input_dir -> extracted parquet in
    output_dir. Returns the StreamingQuery (caller awaits/stops).

    trigger_available_now=True drains everything present then stops —
    the idempotent incremental-batch mode (matches the reference's
    re-scan-on-refresh semantics); False runs continuously."""
    reader = spark.readStream.schema(SPANS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    docs = reader.parquet(input_dir)

    out = extract_documents(docs)

    writer = (
        out.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
