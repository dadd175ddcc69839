"""BM25 lexical retrieval: ranking sanity + the scale-critical plan shape.

Reference parity: generalizes the keyword-scoring surface of the
reference's rule classifier (/root/reference/src/core/classifier.py) to
ranked retrieval; the engine-side contract is the inverted-index probe —
the broadcast query-term set must filter the exploded token stream BEFORE
any aggregation so tf/df work is proportional to matching postings, not
to the corpus vocabulary.
"""

import pytest

from pdf_extractor_spark.operators.textstats import bm25_topk

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "spark spark spark table"),
            (2, "spark table scan scan"),
            (3, "completely unrelated words here"),
            (4, "table"),
            (5, None),
            (6, ""),
        ],
        "doc_id long, text string",
    )


def test_only_matching_docs_scored(docs):
    out = bm25_topk(docs, queries=[("q", "spark scan")], k=10).collect()
    ids = {r.doc_id for r in out}
    assert ids == {1, 2}  # no query-term overlap -> absent, not zero


def test_rank_order_and_determinism(docs):
    rows = bm25_topk(docs, queries=[("q", "scan")], k=10).collect()
    # doc 2 is the only doc containing 'scan'
    assert [(r.doc_id, r.rank) for r in rows] == [(2, 1)]
    again = bm25_topk(docs, queries=[("q", "scan")], k=10).collect()
    assert rows == again


def test_idf_downweights_common_terms(docs):
    # 'table' appears in 3 docs, 'scan' in 1: for the one doc holding
    # both at equal tf (doc 2), the rarer term must contribute more
    out = {
        r.doc_id: r.score
        for r in bm25_topk(docs, queries=[("q", "table scan")]).collect()
    }
    only_table = bm25_topk(docs, queries=[("q", "table")]).collect()
    t_score = {r.doc_id: r.score for r in only_table}
    assert out[2] - t_score[2] > t_score[2]  # scan part > table part


def test_k_truncates(docs):
    out = bm25_topk(docs, queries=[("q", "table")], k=1).collect()
    assert len(out) == 1 and out[0].rank == 1


def test_plan_broadcasts_query_terms(spark):
    import __spark_entry__ as entry

    df = entry.queries()["bm25_topk"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the posting filter and all per-term joins are broadcast — the only
    # shuffles are the (id, term) partial aggregate and the final window
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan
    # tf aggregation does map-side combine before the exchange
    assert "partial_count" in plan or "partial" in plan
