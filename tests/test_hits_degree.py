"""HITS hub/authority and degree CCDF — hand-computed graph cases."""

from pdf_extractor_spark.operators.graph import degree_ccdf, hits


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_hits_star(spark):
    # hub h points at a1, a2; nothing else links. After round 1:
    # hub: h=2/2=1, others 0; auth: a1=a2=0.5, h=0. Round 2 is stable.
    e = _edges(spark, [("h", "a1"), ("h", "a2"), ("h", "h")])  # self-loop dropped
    got = {r.node: r for r in hits(e, iters=2).collect()}
    assert got["h"].hub == 1.0 and got["h"].auth == 0.0
    for a in ("a1", "a2"):
        assert got[a].hub == 0.0 and got[a].auth == 0.5


def test_hits_chain_two_rounds(spark):
    # x -> y -> z: round 1: hub x=y=0.5, z=0; auth y=z=0.5 ... compute:
    # a0 = 1 each. h1 raw: x=a0(y)=1, y=a0(z)=1, z=0 -> L1: x=y=0.5.
    # a1 raw: y=h1(x)=.5, z=h1(y)=.5 -> a1: y=z=0.5, x=0.
    # h2 raw: x=a1(y)=.5, y=a1(z)=.5 -> h2: x=y=0.5.
    # a2 raw: y=h2(x)=.5, z=h2(y)=.5 -> a2: y=z=0.5.
    e = _edges(spark, [("x", "y"), ("y", "z")])
    got = {r.node: r for r in hits(e, iters=2).collect()}
    assert (got["x"].hub, got["x"].auth) == (0.5, 0.0)
    assert (got["y"].hub, got["y"].auth) == (0.5, 0.5)
    assert (got["z"].hub, got["z"].auth) == (0.0, 0.5)


def test_hits_duplicate_edges_collapse(spark):
    e = _edges(spark, [("x", "y"), ("x", "y"), ("y", "z")])
    got = {r.node: r for r in hits(e, iters=2).collect()}
    assert (got["x"].hub, got["y"].hub) == (0.5, 0.5)


def test_degree_ccdf(spark):
    # a->b, a->c, b->c: degrees a=2, b=2, c=2? a: out {b,c}=2, in 0 -> 2;
    # b: out {c}=1, in {a}=1 -> 2; c: in {a,b}=2 -> 2. All degree 2.
    e = _edges(spark, [("a", "b"), ("a", "c"), ("b", "c")])
    rows = degree_ccdf(e).collect()
    assert len(rows) == 1
    assert (rows[0].degree, rows[0].n_hosts, rows[0].ccdf) == (2, 3, 1.0)


def test_degree_ccdf_two_levels(spark):
    # star: h->a1..a3 : h degree 3, leaves degree 1
    e = _edges(spark, [("h", "a1"), ("h", "a2"), ("h", "a3")])
    got = {r.degree: r for r in degree_ccdf(e).collect()}
    assert got[3].n_hosts == 1 and got[3].ccdf == 0.25
    assert got[1].n_hosts == 3 and got[1].ccdf == 1.0
