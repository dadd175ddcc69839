"""Structured-Streaming surfaces: incremental extraction (file-source
micro-batches with checkpoint/exactly-once) and watermarked metrics windows."""

import os

import pytest
from pyspark.sql import functions as F

from pdf_extractor_spark.pipeline import extract_documents
from pdf_extractor_spark.sources.corpus import SPANS_SCHEMA, corpus_rows
from pdf_extractor_spark.streaming import stream_extract, windowed_type_counts
from pdf_extractor_spark.streaming.metrics_stream import METRICS_SCHEMA, stream_metrics


def _rows(start, n):
    return [
        (did, [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans])
        for did, spans in corpus_rows(n, start=start)
    ]


def test_stream_extract_incremental(spark, tmp_path):
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # drop 1: 40 docs
    spark.createDataFrame(_rows(0, 40), SPANS_SCHEMA).write.mode(
        "append"
    ).parquet(inp)
    q = stream_extract(spark, inp, out, ckpt)
    q.awaitTermination(120)

    got1 = spark.read.parquet(out)
    assert got1.count() == 40

    # drop 2: 20 more docs; a fresh availableNow query on the same
    # checkpoint processes ONLY the new files (exactly-once)
    spark.createDataFrame(_rows(40, 20), SPANS_SCHEMA).write.mode(
        "append"
    ).parquet(inp)
    q2 = stream_extract(spark, inp, out, ckpt)
    q2.awaitTermination(120)

    got2 = spark.read.parquet(out)
    assert got2.count() == 60
    assert got2.select("doc_id").distinct().count() == 60

    # streaming output == batch output for the same input (stateless ops)
    batch = extract_documents(spark.read.parquet(inp))
    b = {r.doc_id: (r.doc_type, r.confidence) for r in batch.collect()}
    s = {r.doc_id: (r.doc_type, r.confidence) for r in got2.collect()}
    assert b == s


def test_windowed_type_counts(spark, tmp_path):
    mdir = str(tmp_path / "metrics")
    rows = [
        ("r1", "d1", "invoice", True, 0.9, "2024-01-01 10:00:30", 3, 5),
        ("r1", "d2", "invoice", False, 0.4, "2024-01-01 10:00:50", 2, 2),
        ("r1", "d3", None, True, 0.0, "2024-01-01 10:01:10", 1, 1),
        ("r1", "d4", "receipt", True, 0.8, "2024-01-01 10:03:10", 1, 1),
    ]
    df = spark.createDataFrame(rows, [f.name for f in METRICS_SCHEMA.fields])
    df = df.withColumn("timestamp", F.to_timestamp("timestamp"))
    df.write.mode("append").parquet(mdir)

    stream = stream_metrics(spark, mdir)
    agg = windowed_type_counts(stream, window="1 minute", watermark="1 minute")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (str(r.window_start), r.doc_type): (r["count"], r.success_rate)
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    assert got[("2024-01-01 10:00:00", "invoice")] == (2, 50.0)
    assert got[("2024-01-01 10:01:00", "Desconhecido")] == (1, 100.0)
    assert got[("2024-01-01 10:03:00", "receipt")] == (1, 100.0)
