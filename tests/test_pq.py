"""Product quantization (similarity.pq_codebooks / pq_encode /
pq_adc_topk — Jegou et al. 2011, public ANN literature): hand-checkable
codebook training on a 2-subspace toy corpus, code determinism, ADC
ranking semantics, and recall against the exact L2 top-k on the driver
embeddings table."""

import numpy as np
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _toy(spark):
    # 4-dim vectors, two obvious clusters per 2-dim subspace:
    # left halves near (0,0) / (10,10); right halves near (0,10) / (10,0)
    rows = [
        (0, [0.0, 0.0, 0.0, 10.0]),
        (1, [0.1, 0.0, 0.0, 9.9]),
        (2, [10.0, 10.0, 10.0, 0.0]),
        (3, [9.9, 10.1, 10.0, 0.1]),
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )


def test_pq_codebooks_toy_shape_and_means(spark):
    from pdf_extractor_spark.operators.similarity import pq_codebooks

    books = pq_codebooks(_toy(spark), m=2, ks=2, refine_iters=1)
    assert len(books) == 2 and books[0].shape == (2, 2)
    # stride = 4//2 = 2 -> seeds are vec_id 0 and 2; after one Lloyd
    # iteration each code word is the mean of its two cluster members
    np.testing.assert_allclose(
        books[0], [[0.05, 0.0], [9.95, 10.05]], atol=1e-6
    )
    np.testing.assert_allclose(
        books[1], [[0.0, 9.95], [10.0, 0.05]], atol=1e-6
    )


def test_pq_encode_toy_codes(spark):
    from pdf_extractor_spark.operators.similarity import (
        pq_codebooks,
        pq_encode,
    )

    df = _toy(spark)
    books = pq_codebooks(df, m=2, ks=2)
    codes = {
        r.id: list(r.codes) for r in pq_encode(df, books, m=2).collect()
    }
    assert codes == {0: [0, 0], 1: [0, 0], 2: [1, 1], 3: [1, 1]}


def test_pq_adc_self_match_and_rank_contract(spark):
    from pdf_extractor_spark.operators.similarity import (
        pq_adc_topk,
        pq_codebooks,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    books = pq_codebooks(emb)
    q = emb.filter(F.col("vec_id") < 8).withColumnRenamed(
        "vec_id", "query_id"
    )
    top = pq_adc_topk(emb, q, k=10, books=books)
    rows = top.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == set(range(8))
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, 11))
        # adc is non-decreasing with rank (round-before-rank contract)
        adcs = [r.adc for r in rs]
        assert adcs == sorted(adcs)
        # the query's own vector is in its top-10 (usually rank 1 —
        # quantization can only add a bounded distortion)
        assert any(r.id == qid for r in rs)


def test_pq_rerank_recall_vs_exact_l2(spark):
    """The production cascade's recall@10 vs the exact L2 top-10 >= 0.6
    on the synthetic embeddings (high intrinsic dimension — the hard
    case; m=8 x 16 words, ADC top-40 candidates, exact rerank). Bounded
    by the candidate stage: every exact-top-10 member the ADC scan
    nominates IS recovered exactly by the rerank."""
    from pdf_extractor_spark.operators.similarity import (
        pq_codebooks,
        pq_rerank_topk,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    vecs = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in emb.collect()
    }
    books = pq_codebooks(emb)
    q = emb.filter(F.col("vec_id") < 8).withColumnRenamed(
        "vec_id", "query_id"
    )
    top = pq_rerank_topk(emb, q, k=10, rerank=40, books=books)
    got = {}
    for r in top.collect():
        got.setdefault(r.query_id, set()).add(r.id)
    hits = total = 0
    ids = sorted(vecs)
    mat = np.stack([vecs[i] for i in ids])
    for qid in range(8):
        d = ((mat - vecs[qid]) ** 2).sum(axis=1)
        exact = {ids[i] for i in np.argsort(d, kind="stable")[:10]}
        hits += len(exact & got[qid])
        total += 10
    assert hits / total >= 0.6, f"recall {hits}/{total}"


def test_pq_codes_deterministic_across_calls(spark):
    from pdf_extractor_spark.operators.similarity import (
        pq_codebooks,
        pq_encode,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    b1 = pq_codebooks(emb)
    b2 = pq_codebooks(emb)
    for a, b in zip(b1, b2):
        np.testing.assert_array_equal(a, b)
    c1 = sorted(map(tuple, pq_encode(emb, b1).collect()))
    c2 = sorted(map(tuple, pq_encode(emb, b2).collect()))
    assert c1 == c2


def test_pq_empty_and_empty_query_edges(spark):
    """Degenerate inputs: an empty corpus raises explicitly at codebook
    training (not an opaque numpy shape error); an empty query set
    yields an empty top-k frame with the right schema."""
    import pytest as _pytest

    from pdf_extractor_spark.operators.similarity import (
        pq_adc_topk,
        pq_codebooks,
    )

    empty = spark.createDataFrame(
        [], "vec_id long, embedding array<float>"
    )
    with _pytest.raises(ValueError, match="non-empty corpus"):
        pq_codebooks(empty)

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    books = pq_codebooks(emb)
    no_q = empty.withColumnRenamed("vec_id", "query_id")
    out = pq_adc_topk(emb, no_q, k=5, books=books)
    assert out.count() == 0
    assert out.columns == ["query_id", "id", "adc", "rank"]
