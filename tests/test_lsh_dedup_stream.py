"""Streaming LSH near-dup gate (foreachBatch over the batch probe): index
near-dups suppressed, fresh docs pass, restart resumes from checkpoint."""

from pyspark.sql import functions as F

from pdf_extractor_spark.streaming.lsh_dedup_stream import streaming_lsh_dedup

BASE = "the quick brown fox jumps over the lazy sleeping dog tonight again"


def _start(spark, inp, out, ckpt, index):
    stream = spark.readStream.schema("doc_id long, text string").parquet(inp)
    q = streaming_lsh_dedup(stream, index, out, ckpt, threshold=0.5)
    q.awaitTermination(120)


def test_streaming_lsh_gate_and_resume(spark, tmp_path):
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    index = spark.createDataFrame(
        [(1, BASE), (2, "completely different corpus text with nothing shared here")],
        "doc_id long, text string",
    )

    # batch 1: 10 near-dups index doc 1 (one word changed) -> suppressed;
    # 11 is fresh -> passes
    spark.createDataFrame(
        [(10, BASE.replace("tonight", "today")),
         (11, "unrelated fresh document that matches nothing in the index")],
        "doc_id long, text string",
    ).write.mode("append").parquet(inp)
    _start(spark, inp, out, ckpt, index)
    assert {r.doc_id for r in spark.read.parquet(out).collect()} == {11}

    # batch 2 after restart: 12 near-dups index doc 2 -> suppressed; 13
    # fresh -> passes; batch 1 files are NOT reprocessed (checkpoint)
    spark.createDataFrame(
        [(12, "completely different corpus text with nothing shared HERE"),
         (13, "another genuinely novel document body with its own words")],
        "doc_id long, text string",
    ).write.mode("append").parquet(inp)
    _start(spark, inp, out, ckpt, index)
    assert {r.doc_id for r in spark.read.parquet(out).collect()} == {11, 13}
