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


def _kmeans_ref(vecs, k, iters):
    """Pure-numpy replay of ivf_centroids + kmeans_cluster_stats:
    stride seeding, assign by cosine (ties to lowest cid), element-wise
    mean updates with empty clusters keeping their previous centroid."""
    import numpy as np

    v = np.asarray(vecs, dtype=np.float64)
    n = len(v)
    stride = max(1, n // k)
    cents = v[[i for i in range(n) if i % stride == 0][:k]].copy()

    def assign(c):
        cn = c / np.linalg.norm(c, axis=1, keepdims=True)
        vn = v / np.clip(np.linalg.norm(v, axis=1, keepdims=True), 1e-300, None)
        sims = vn @ cn.T
        return np.argmax(sims, axis=1)  # argmax ties -> lowest index

    for _ in range(iters):
        a = assign(cents)
        new = cents.copy()
        for c in range(k):
            members = v[a == c]
            if len(members):
                new[c] = members.mean(axis=0)
        cents = new
    a = assign(cents)
    stats = {}
    for c in range(k):
        members = v[a == c]
        if not len(members):
            continue
        cn = cents[c] / np.linalg.norm(cents[c])
        coss = [
            round(float(m @ cn / np.linalg.norm(m)), 4) for m in members
        ]
        stats[c] = (len(members), round(sum(coss) / len(coss), 4))
    return stats


def test_kmeans_cluster_stats_matches_numpy(spark, emb):
    from pdf_extractor_spark.operators.similarity import kmeans_cluster_stats

    rows = emb.orderBy("vec_id").collect()
    vecs = [r.embedding for r in rows]
    want = _kmeans_ref(vecs, k=4, iters=2)
    got = {
        r.cluster: (r.n_vecs, r.avg_cosine)
        for r in kmeans_cluster_stats(emb, n_clusters=4, refine_iters=2).collect()
    }
    assert set(got) == set(want)
    for c in want:
        assert got[c][0] == want[c][0], (c, got[c], want[c])
        assert abs(got[c][1] - want[c][1]) <= 1e-3, (c, got[c], want[c])


def test_kmeans_occupancy_covers_corpus(spark, emb):
    from pdf_extractor_spark.operators.similarity import kmeans_cluster_stats

    total = emb.count()
    stats = kmeans_cluster_stats(emb, n_clusters=8, refine_iters=2).collect()
    assert sum(r.n_vecs for r in stats) == total
    assert all(r.avg_cosine is not None for r in stats)


def test_hard_negatives_excludes_same_and_null_labels(spark):
    from pdf_extractor_spark.operators.similarity import hard_negatives
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ])
    def v(x, y):
        return [float(x), float(y)] + [0.0] * 6
    rows = [
        (0, v(1, 0), 0),      # the query
        (1, v(1, 0.01), 0),   # same label: excluded even though nearest
        (2, v(0.9, 0.1), 1),  # hard negative (closest other-label)
        (3, v(0, 1), 1),      # easy negative
        (4, v(1, 0), None),   # null label: excluded
    ]
    emb = spark.createDataFrame(rows, schema)
    q = emb.filter(F.col("vec_id") == 0).withColumnRenamed("vec_id", "query_id")
    got = hard_negatives(emb, q, k=10).orderBy("rank").collect()
    assert [r.id for r in got] == [2, 3]
    assert got[0].rank == 1 and got[0].cosine > got[1].cosine
