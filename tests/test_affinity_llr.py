"""order_deciles, part_affinity, collocations_llr — hand-computed cases."""

import math

from pdf_extractor_spark.operators.analytics import (
    order_deciles,
    part_affinity,
)
from pdf_extractor_spark.operators.curation import collocations_llr


def test_order_deciles(spark):
    orders = spark.createDataFrame(
        [(i, 1, float(i * 10)) for i in range(1, 21)],
        "o_orderkey long, o_custkey long, o_totalprice double",
    )
    customer = spark.createDataFrame(
        [(1, "BUILDING")], "c_custkey long, c_mktsegment string"
    )
    got = {r.decile: r for r in order_deciles(orders, customer).collect()}
    # 20 orders over 10 tiles -> 2 each, ascending by price
    assert len(got) == 10
    assert got[1].n_orders == 2
    assert (got[1].min_price, got[1].max_price) == (10.0, 20.0)
    assert (got[10].min_price, got[10].max_price) == (190.0, 200.0)
    assert got[5].avg_price == (90.0 + 100.0) / 2


def test_part_affinity(spark):
    rows = [
        (1, 100), (1, 200),       # basket {100,200}
        (2, 100), (2, 200),       # again -> pair_n 2
        (3, 100), (3, 300),       # {100,300} once -> below min_pairs
        (4, 400),                 # singleton
        (2, 100),                 # duplicate line collapses in inventory
    ]
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    out = part_affinity(li, min_pairs=2).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.part_a, r.part_b, r.pair_n) == (100, 200, 2)
    # N=4 orders, n_a(100)=3, n_b(200)=2: lift = 2*4/(3*2)
    assert r.n_a == 3 and r.n_b == 2
    assert abs(r.lift - round(8 / 6, 4)) < 1e-12


def test_collocations_llr(spark):
    # "new york" 3 times + noise bigrams
    rows = [
        (1, "new york new york new york"),
        (2, "old town old town"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.a, r.b): r for r in collocations_llr(df, min_pairs=3).collect()}
    assert ("new", "york") in got
    r = got[("new", "york")]
    assert r.pair_n == 3
    # margins from ALL bigrams: doc1 has bigrams (new,york)x3,(york,new)x2;
    # doc2: (old,town)x2,(town,old)x1 -> N=8; n_a(new)=3, n_b(york)=3
    assert (r.n_a, r.n_b) == (3, 3)

    def S(k):
        return k * math.log(k) if k > 0 else 0.0

    N, na, nb, k11 = 8, 3, 3, 3
    k12, k21, k22 = na - k11, nb - k11, N - na - nb + k11
    llr = 2 * (
        S(k11) + S(k12) + S(k21) + S(k22)
        - S(na) - S(N - na) - S(nb) - S(N - nb) + S(N)
    )
    assert abs(r.llr - round(llr, 4)) < 1e-9
    # the 3x repeated true collocation scores positive
    assert r.llr > 0
