"""Streaming trained-model scoring: stream output == batch twin
bit-for-bit (exact-integer weights make margins order-free), threshold
routing honored, model rides the plan (no state store)."""

import os

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _trained(spark):
    from pdf_extractor_spark.operators.textstats import train_hash_lr_weights

    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    labeled = docs.withColumn(
        "_label", F.coalesce(F.col("text"), F.lit("")).rlike(r"\bspark\b")
    )
    rows = sorted(
        train_hash_lr_weights(labeled, "_label").collect(),
        key=lambda r: r["bucket"],
    )
    weights = [r["weight"] for r in rows]
    from pdf_extractor_spark.operators.textstats import hash_lr_score

    scored = hash_lr_score(
        labeled, weights=[float(w) for w in weights], binary=True
    )
    st = scored.join(labeled.select("doc_id", "_label"), "doc_id").agg(
        F.sum(F.when(F.col("_label"), F.col("margin"))).alias("sp"),
        F.sum(F.when(~F.col("_label"), F.col("margin"))).alias("sn"),
        F.sum(F.col("_label").cast("long")).alias("cp"),
        F.sum((~F.col("_label")).cast("long")).alias("cn"),
    ).collect()[0]
    tau = (st["sp"] * st["cn"] + st["sn"] * st["cp"]) / (
        2.0 * st["cp"] * st["cn"]
    )
    return weights, tau


def test_stream_scoring_equals_batch_twin(spark, tmp_path):
    from pdf_extractor_spark.streaming.score_stream import score_stream

    weights, tau = _trained(spark)

    inp, out, ckpt = (
        str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet")).limit(200)
    docs.write.mode("append").parquet(inp)

    stream = spark.readStream.schema(SCHEMA).parquet(inp)
    q = (
        score_stream(stream, weights, threshold=tau)
        .select("doc_id", "margin", "accept")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        r["doc_id"]: (r["margin"], r["accept"])
        for r in spark.read.parquet(out).collect()
    }
    batch = score_stream(spark.read.parquet(inp), weights, threshold=tau)
    want = {
        r["doc_id"]: (r["margin"], r["accept"])
        for r in batch.select("doc_id", "margin", "accept").collect()
    }
    assert got == want and len(got) == 200
    # threshold routing is non-vacuous: both classes present
    accepts = {v[1] for v in got.values()}
    assert accepts == {True, False}
