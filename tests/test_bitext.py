"""bitext_margin_pairs: hand-computed ratio margins (all-integer scoring),
degenerate-input guards, and the shared-cross-score plan shape."""

from pdf_extractor_spark.operators.similarity import bitext_margin_pairs

SCHEMA = "vec_id long, embedding array<float>, label int"


def _mine(spark, src_rows, tgt_rows, **kw):
    src = spark.createDataFrame(src_rows, SCHEMA)
    tgt = spark.createDataFrame(tgt_rows, SCHEMA)
    return {
        r.src_id: (r.tgt_id, r.cos_e4, r.margin_e4, r.accepted)
        for r in bitext_margin_pairs(src, tgt, **kw).collect()
    }


def test_hand_computed_margins(spark):
    # s1=[1,0] s2=[.6,.8]; t1=[1,0] t2=[0,1]
    # cos_e4: s1->t1 10000, s1->t2 0; s2->t1 6000, s2->t2 8000
    # margin(s1)=1/((0.5+0.8)/2)=1.5384..; margin(s2)=.8/((0.7+0.4)/2)=1.4545..
    got = _mine(
        spark,
        [(1, [1.0, 0.0], 0), (2, [0.6, 0.8], 0)],
        [(11, [1.0, 0.0], 1), (12, [0.0, 1.0], 1)],
        k=4,
        margin_threshold_e4=15000,
    )
    assert got[1] == (11, 10000, 15384, True)
    assert got[2] == (12, 8000, 14545, False)


def test_zero_and_null_vectors_dropped(spark):
    got = _mine(
        spark,
        [(1, [1.0, 0.0], 0), (2, [0.0, 0.0], 0), (3, None, 0)],
        [(11, [1.0, 0.0], 1), (12, [0.0, 0.0], 1)],
    )
    assert set(got) == {1}
    assert got[1][0] == 11


def test_negative_best_cosine_yields_null_margin(spark):
    # only target is opposed to the source: best cos < 0 -> margin NULL,
    # accepted False (never NULL)
    got = _mine(
        spark,
        [(1, [1.0, 0.0], 0)],
        [(11, [-1.0, 0.0], 1)],
    )
    assert got[1] == (11, -10000, None, False)


def test_rerank_is_deterministic_on_ties(spark):
    # two identical targets: tie on cosine -> lower tgt_id wins rank 1
    got = _mine(
        spark,
        [(1, [1.0, 0.0], 0)],
        [(12, [2.0, 0.0], 1), (11, [1.0, 0.0], 1)],
    )
    assert got[1][0] == 11


def test_cross_score_exchange_reused(spark):
    """Both rank windows consume ONE shared cross-score relation — the
    plan must reuse the exchange, not recompute the broadcast join."""
    src = spark.createDataFrame([(1, [1.0, 0.0], 0)], SCHEMA)
    tgt = spark.createDataFrame([(11, [1.0, 0.0], 1)], SCHEMA)
    plan = (
        bitext_margin_pairs(src, tgt)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ReusedExchange" in plan or plan.count("BroadcastHashJoin") <= 2, plan
