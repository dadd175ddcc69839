"""Stateful streaming first-seen dedup (applyInPandasWithState): duplicates
suppressed within a batch AND across micro-batches via checkpointed state."""

import pytest
from pyspark.sql import functions as F

from pdf_extractor_spark.streaming.dedup_stream import streaming_first_seen


def _run_available_now(spark, inp, out, ckpt):
    stream = spark.readStream.schema("doc_id string, text string").parquet(inp)
    dedup = streaming_first_seen(stream)
    q = (
        dedup.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return {r.doc_id for r in spark.read.parquet(out).collect()}


def test_first_seen_within_and_across_batches(spark, tmp_path):
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: A and B duplicate each other; C unique
    spark.createDataFrame(
        [("A", "same text"), ("B", "same text"), ("C", "unique one")],
        "doc_id string, text string",
    ).write.mode("append").parquet(inp)
    got1 = _run_available_now(spark, inp, out, ckpt)
    assert len(got1) == 2  # one of {A,B} + C
    assert "C" in got1

    # batch 2: D repeats batch-1 text (must be suppressed by STATE restored
    # from the checkpoint), E is new
    spark.createDataFrame(
        [("D", "same text"), ("E", "brand new")],
        "doc_id string, text string",
    ).write.mode("append").parquet(inp)
    got2 = _run_available_now(spark, inp, out, ckpt)
    assert got2 == got1 | {"E"}  # E added, D suppressed across batches
