"""IVF+PQ composition (similarity.ivfpq_topk — the IVFADC index shape
from the public ANN literature, sans residual encoding): candidate
restriction to probed inverted lists, ADC agreement with the pure PQ
scan on shared candidates, rank contract, and recall vs exact L2."""

import numpy as np
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _setup(spark):
    from pdf_extractor_spark.operators.similarity import (
        ivf_centroids,
        pq_codebooks,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cents = ivf_centroids(emb, 16)
    books = pq_codebooks(emb)
    q = emb.filter(F.col("vec_id") < 8).withColumnRenamed(
        "vec_id", "query_id"
    )
    return emb, cents, books, q


def test_ivfpq_candidates_come_from_probed_lists(spark):
    """Every returned id belongs to one of its query's n_probe probed
    lists — the inverted-file restriction that makes the scan
    sub-linear (probe cost ~ corpus * n_probe / n_centroids)."""
    from pdf_extractor_spark.operators.similarity import (
        _assign_udf,
        ivfpq_topk,
    )

    emb, cents, books, q = _setup(spark)
    top = ivfpq_topk(
        emb, q, k=10, n_probe=4, centroids=cents, books=books
    ).collect()

    assign1 = _assign_udf(cents, 1)
    corpus_cluster = {
        r.vec_id: r.c[0]
        for r in emb.select(
            "vec_id", assign1(F.col("embedding")).alias("c")
        ).collect()
    }
    assign4 = _assign_udf(cents, 4)
    probes = {
        r.query_id: set(r.c)
        for r in q.select(
            "query_id", assign4(F.col("embedding")).alias("c")
        ).collect()
    }
    assert top, "no rows returned"
    for r in top:
        assert corpus_cluster[r.id] in probes[r.query_id], (
            f"id {r.id} (list {corpus_cluster[r.id]}) not in "
            f"query {r.query_id}'s probes {probes[r.query_id]}"
        )


def test_ivfpq_adc_agrees_with_pure_pq_scan(spark):
    """On candidates both paths score, the ADC value is identical —
    IVF only restricts the candidate set, it never changes the
    asymmetric distance."""
    from pdf_extractor_spark.operators.similarity import (
        ivfpq_topk,
        pq_adc_topk,
    )

    emb, cents, books, q = _setup(spark)
    ivfpq = {
        (r.query_id, r.id): r.adc
        for r in ivfpq_topk(
            emb, q, k=10, centroids=cents, books=books
        ).collect()
    }
    full = {
        (r.query_id, r.id): r.adc
        for r in pq_adc_topk(emb, q, k=50, books=books).collect()
    }
    shared = set(ivfpq) & set(full)
    assert shared, "no shared candidates"
    for key in shared:
        assert ivfpq[key] == full[key]


def test_ivfpq_rank_contract_and_self_match(spark):
    from pdf_extractor_spark.operators.similarity import ivfpq_topk

    emb, cents, books, q = _setup(spark)
    rows = ivfpq_topk(
        emb, q, k=10, centroids=cents, books=books
    ).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == set(range(8))
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        adcs = [r.adc for r in rs]
        assert adcs == sorted(adcs)
        # the query's own vector lives in a probed list (its top-1 list
        # is its first probe), so it must appear in its own top-10
        assert any(r.id == qid for r in rs)


def test_ivfpq_recall_decomposition(spark):
    """Recall@10 vs exact L2 with 8/16 lists probed, decomposed into its
    two loss sources on the deterministic sf0.001 corpus (near-uniform
    distances — the hard case for any quantizer):

      * list pruning costs (next to) nothing: ivfpq recall is within
        0.05 of the pure PQ ADC scan's recall at the same k, i.e. the
        exact-top-10 members IVF drops were ones ADC would have
        mis-ranked anyway;
      * the residual loss is raw-ADC-top-10 distortion (no rerank
        stage here — `pq_rerank_topk` is the cascade that recovers it),
        with an absolute floor well above random (10/2000)."""
    from pdf_extractor_spark.operators.similarity import (
        ivfpq_topk,
        pq_adc_topk,
    )

    emb, cents, books, q = _setup(spark)
    vecs = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in emb.collect()
    }
    got = {}
    for r in ivfpq_topk(
        emb, q, k=10, centroids=cents, books=books
    ).collect():
        got.setdefault(r.query_id, set()).add(r.id)
    pq_got = {}
    for r in pq_adc_topk(emb, q, k=10, books=books).collect():
        pq_got.setdefault(r.query_id, set()).add(r.id)
    ids = sorted(vecs)
    mat = np.stack([vecs[i] for i in ids])
    hits = pq_hits = total = 0
    for qid in range(8):
        d = ((mat - vecs[qid]) ** 2).sum(axis=1)
        exact = {ids[i] for i in np.argsort(d, kind="stable")[:10]}
        hits += len(exact & got.get(qid, set()))
        pq_hits += len(exact & pq_got.get(qid, set()))
        total += 10
    assert hits / total >= 0.15, f"recall {hits}/{total}"
    assert hits / total >= pq_hits / total - 0.05, (
        f"list pruning lost more than 0.05 recall: "
        f"ivfpq {hits}/{total} vs pq {pq_hits}/{total}"
    )


def test_ivfpq_empty_query_edge(spark):
    from pdf_extractor_spark.operators.similarity import ivfpq_topk

    emb, cents, books, _ = _setup(spark)
    no_q = spark.createDataFrame(
        [], "query_id long, embedding array<float>"
    )
    out = ivfpq_topk(emb, no_q, k=5, centroids=cents, books=books)
    assert out.count() == 0
    assert out.columns == ["query_id", "id", "adc", "rank"]
