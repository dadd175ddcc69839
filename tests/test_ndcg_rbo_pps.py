"""ndcg_topk, rank_biased_overlap, pps_sample — hand-computed cases."""

import hashlib
import math

from pyspark.sql import functions as F

from pdf_extractor_spark.operators.curation import pps_sample
from pdf_extractor_spark.operators.graph import rank_biased_overlap
from pdf_extractor_spark.operators.similarity import ndcg_topk


def test_ndcg_perfect_retrieval(spark):
    # two well-separated classes; every query's class-mates are nearest
    rows = [
        (0, [1.0, 0.0], 1), (1, [0.99, 0.01], 1), (2, [0.98, 0.02], 1),
        (3, [0.0, 1.0], 2), (4, [0.01, 0.99], 2),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    q = df.filter(F.col("vec_id") == 0).withColumnRenamed("vec_id", "query_id")
    r = ndcg_topk(df, q, k=10).collect()[0]
    # R = 3 relevant; retrieved at ranks 1,2,3 -> dcg == idcg -> ndcg 1
    assert r.n_rel == 3
    assert r.ndcg == 1.0
    exp_idcg = sum(1 / math.log2(i + 1) for i in (1, 2, 3))
    assert abs(r.idcg - round(exp_idcg, 6)) < 1e-9


def test_ndcg_worst_case_relevant_last(spark):
    # query's only class-mate sits opposite; ranks: self(rel) first,
    # mate(rel) last of 4
    rows = [
        (0, [1.0, 0.0], 1), (1, [-1.0, 0.0], 1),
        (2, [0.9, 0.1], 2), (3, [0.8, 0.2], 2),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    q = df.filter(F.col("vec_id") == 0).withColumnRenamed("vec_id", "query_id")
    r = ndcg_topk(df, q, k=10).collect()[0]
    dcg = 1 / math.log2(2) + 1 / math.log2(5)
    idcg = 1 / math.log2(2) + 1 / math.log2(3)
    assert abs(r.dcg - round(dcg, 6)) < 1e-9
    assert abs(r.ndcg - round(round(dcg, 6) / round(idcg, 6), 5)) < 1e-4


def _rankdf(spark, items, col):
    return spark.createDataFrame(
        [(h, float(s)) for h, s in items], f"host string, {col} double"
    )


def test_rbo_identical_rankings(spark):
    a = _rankdf(spark, [("a", 3), ("b", 2), ("c", 1)], "rank")
    b = _rankdf(spark, [("a", 9), ("b", 5), ("c", 2)], "auth")
    r = rank_biased_overlap(a, b, depth=3, p=0.9).collect()[0]
    # identical order: X_d = d for all d -> rbo = (1-p) sum p^(d-1) = 1-p^3
    assert abs(r.rbo - round(1 - 0.9**3, 6)) < 1e-6
    assert r.overlap_at_depth == 1.0


def test_rbo_disjoint_prefix(spark):
    # reversed rankings of 4 items at depth 2: X_1 = 0, X_2 = 0
    a = _rankdf(spark, [("a", 4), ("b", 3), ("c", 2), ("d", 1)], "rank")
    b = _rankdf(spark, [("a", 1), ("b", 2), ("c", 3), ("d", 4)], "auth")
    r = rank_biased_overlap(a, b, depth=2, p=0.9).collect()[0]
    assert r.rbo == 0.0 and r.overlap_at_depth == 0.0


def test_pps_sample(spark):
    rows = [(i, 100) for i in range(100)] + [(1000, 10_000_000)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    got = {r.doc_id: r for r in pps_sample(df, k=5).collect()}
    # the whale dominates the weight: k*w/W > 1 -> always picked, prob 1
    assert 1000 in got and got[1000].incl_prob == 1.0
    # every emitted row matches the deterministic md5 draw
    W = 100 * 100 + 10_000_000
    for r in got.values():
        u = int(
            hashlib.md5(f"pps:{r.doc_id}".encode()).hexdigest()[:15], 16
        ) / float(1 << 60)
        p = min(1.0, 5 * r.weight / W)
        assert u < p and r.picked is True
