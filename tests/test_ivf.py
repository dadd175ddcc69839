"""IVF ANN: recall against the exact brute-force baseline on the driver
embeddings table (the similarity-search quality gate)."""

import os

import pytest
from pyspark.sql import functions as F

from pdf_extractor_spark.operators.similarity import cosine_topk, ivf_topk

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    p = os.path.join(SF_DIR, "embeddings.parquet")
    return spark.read.parquet(p).cache()


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.id)
    return out


def test_ivf_recall_vs_bruteforce(spark, emb):
    q = emb.filter(F.col("vec_id") < 5).withColumnRenamed("vec_id", "query_id")
    exact = _topk_sets(cosine_topk(emb, q, k=10))
    approx = _topk_sets(
        ivf_topk(emb, q, k=10, n_centroids=16, n_probe=8)
    )
    recalls = [
        len(exact[qid] & approx.get(qid, set())) / len(exact[qid])
        for qid in exact
    ]
    assert sum(recalls) / len(recalls) >= 0.8, recalls


def test_ivf_self_match_rank1(spark, emb):
    q = emb.filter(F.col("vec_id") < 5).withColumnRenamed("vec_id", "query_id")
    top = ivf_topk(emb, q, k=1, n_centroids=16, n_probe=8)
    for r in top.collect():
        assert r.id == r.query_id and r.rank == 1  # a vector's NN is itself
