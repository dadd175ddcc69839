"""Exact-k A-ES weighted sampling (curation.weighted_sample): python
key-replay parity, exact-k contract, weight bias, and edge cases."""

import hashlib
import math

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _key(doc_id, w):
    u = (
        int(
            hashlib.md5(f"aes:{doc_id}".encode()).hexdigest()[:15], 16
        )
        + 1.0
    ) / float(1 << 60)
    return round(-math.log(u) / w, 12)


def test_weighted_sample_matches_python_replay(spark):
    from pdf_extractor_spark.operators.curation import weighted_sample

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    rows = docs.select("doc_id", "n_chars").collect()
    keyed = sorted(
        (
            (_key(r.doc_id, float(r.n_chars)), r.doc_id)
            for r in rows
            if r.n_chars is not None and r.n_chars > 0
        )
    )[:20]
    want = [
        (doc_id, k, i + 1) for i, (k, doc_id) in enumerate(keyed)
    ]

    got = [
        (r.doc_id, r.draw_key, r.pick_rank)
        for r in weighted_sample(docs, k=20)
        .orderBy("pick_rank")
        .collect()
    ]
    assert got == want


def test_weighted_sample_exact_k_and_deterministic(spark):
    from pdf_extractor_spark.operators.curation import weighted_sample

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = weighted_sample(docs, k=50).orderBy("pick_rank").collect()
    b = weighted_sample(docs, k=50).orderBy("pick_rank").collect()
    assert len(a) == 50
    assert [r.doc_id for r in a] == [r.doc_id for r in b]
    assert [r.pick_rank for r in a] == list(range(1, 51))


def test_weighted_sample_biased_toward_heavy_rows(spark):
    """P(include) rises with weight, so the sample's mean weight must
    exceed the corpus mean (deterministic on this corpus)."""
    from pdf_extractor_spark.operators.curation import weighted_sample

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    corpus_mean = docs.where(F.col("n_chars") > 0).agg(
        F.avg("n_chars")
    ).collect()[0][0]
    sample_mean = (
        weighted_sample(docs, k=50).agg(F.avg("weight")).collect()[0][0]
    )
    assert sample_mean > corpus_mean


def test_weighted_sample_skips_nonpositive_weights(spark):
    from pdf_extractor_spark.operators.curation import weighted_sample

    df = spark.createDataFrame(
        [(1, 10.0), (2, 0.0), (3, None), (4, 5.0)],
        "doc_id long, n_chars double",
    )
    got = {r.doc_id for r in weighted_sample(df, k=10).collect()}
    assert got == {1, 4}


def test_weighted_sample_k_larger_than_corpus(spark):
    from pdf_extractor_spark.operators.curation import weighted_sample

    df = spark.createDataFrame(
        [(1, 10.0), (2, 3.0)], "doc_id long, n_chars double"
    )
    assert weighted_sample(df, k=100).count() == 2
