"""Reciprocal top-k pairs within coarse clusters (similarity.mutual_knn):
hand-built geometry where mutuality prunes a hub artifact, symmetry/
dedup contract, and a python brute-force replay on the driver corpus."""

import numpy as np
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_mutual_knn_prunes_one_directional_hub(spark):
    """k=1 toy in one cluster: a-b are each other's nearest (mutual);
    c's nearest is a, but a's nearest is b — so c appears in NO pair.
    Vectors are 2-d directions; a single centroid keeps one cluster."""
    from pdf_extractor_spark.operators.similarity import mutual_knn

    rows = [
        (0, [1.0, 0.0]),
        (1, [0.999, 0.01]),
        (2, [0.7, 0.714]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = np.asarray([[1.0, 0.0]], dtype=np.float64)
    got = [
        (r.id_a, r.id_b)
        for r in mutual_knn(df, k=1, centroids=cents).collect()
    ]
    assert got == [(0, 1)]


def test_mutual_knn_symmetric_dedup_and_bruteforce_parity(spark):
    from pdf_extractor_spark.operators.similarity import (
        _assign_udf,
        ivf_centroids,
        mutual_knn,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cents = ivf_centroids(emb, 16)
    got = {
        (r.id_a, r.id_b)
        for r in mutual_knn(emb, k=5, centroids=cents).collect()
    }
    assert all(a < b for a, b in got)

    # python replay: cluster assign, per-cluster 4dp-cosine top-5, mutual
    assign1 = _assign_udf(cents, 1)
    rows = emb.select(
        "vec_id", "embedding", assign1(F.col("embedding")).alias("c")
    ).collect()
    byc = {}
    for r in rows:
        byc.setdefault(r.c[0], []).append(
            (r.vec_id, np.asarray(r.embedding, dtype=np.float64))
        )
    knn = {}
    for members in byc.values():
        for i, vi in members:
            scored = []
            for j, vj in members:
                if i == j:
                    continue
                cos = round(
                    float(vi @ vj)
                    / (np.linalg.norm(vi) * np.linalg.norm(vj)),
                    4,
                )
                scored.append((-cos, j))
            scored.sort()
            knn[i] = {j for _, j in scored[:5]}
    want = {
        (a, b)
        for a, nbrs in knn.items()
        for b in nbrs
        if a < b and a in knn.get(b, set())
    }
    assert got == want
