"""doc_similar_topk and cluster_size_hist wrapper — hand-computed."""

from pdf_extractor_spark.operators.textstats import doc_similar_topk


def test_doc_similar_topk_self_first(spark):
    rows = [
        (0, "alpha beta gamma delta"),
        (1, "alpha beta gamma delta"),      # identical to 0
        (2, "completely different words here"),
        (3, "alpha beta unrelated tail"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for r in doc_similar_topk(df, dim=16, n_queries=2, k=4).collect():
        got.setdefault(r.query_id, []).append(r)
    for qid in (0, 1):
        ranked = sorted(got[qid], key=lambda r: r.rank)
        # identical docs tie at cosine 1.0; smaller id wins rank 1
        assert ranked[0].cosine == 1.0 and ranked[1].cosine == 1.0
        assert [r.id for r in ranked[:2]] == [0, 1]
        # partial overlap scores strictly between the tie and unrelated
        ids = {r.id: r.cosine for r in ranked}
        assert 0.0 < ids.get(3, 0.0) < 1.0


def test_doc_similar_topk_rank_bound(spark):
    rows = [(i, f"word{i} filler text") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = doc_similar_topk(df, dim=16, n_queries=1, k=3).collect()
    assert len(out) == 3
    assert all(r.query_id == 0 for r in out)
    assert sorted(r.rank for r in out) == [1, 2, 3]
