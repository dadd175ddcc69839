"""pagerank: closed-form checks on tiny graphs + engine-shape pins."""

import pytest
from pyspark.sql import functions as F

from pdf_extractor_spark.operators.graph import pagerank


def _ranks(spark, edges, iters=3, d=0.85):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {r.node: r.rank for r in pagerank(df, iters=iters, damping=d).collect()}


def _expected(edges, iters, d=0.85):
    nodes = sorted({n for e in edges for n in e})
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    n = len(nodes)
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        contrib = {v: 0.0 for v in nodes}
        for s, t in edges:
            contrib[t] += rank[s] / out[s]
        rank = {v: (1 - d) / n + d * contrib[v] for v in nodes}
    return rank


def test_pagerank_matches_reference_iteration(spark):
    edges = [("a", "b"), ("b", "a"), ("c", "a"), ("c", "b")]
    got = _ranks(spark, edges, iters=3)
    want = _expected(edges, iters=3)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-6)
    # a receives from b and c -> outranks the dangling-ish c
    assert got["a"] > got["c"]


def test_pagerank_dedups_edges_and_drops_self_loops(spark):
    edges = [("a", "b"), ("a", "b"), ("a", "a"), ("b", "a")]
    got = _ranks(spark, edges, iters=2)
    want = _expected([("a", "b"), ("b", "a")], iters=2)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-6)


def test_pagerank_dangling_mass_leaks(spark):
    # c has no outlinks: its damped mass leaves the system each round
    got = _ranks(spark, [("a", "c"), ("b", "c"), ("c2", "a"), ("c2", "b")], iters=3)
    assert sum(got.values()) < 1.0


def test_pagerank_plan_has_no_python_and_no_collect_scaling(spark):
    df = spark.createDataFrame([("a", "b"), ("b", "a")], "src string, dst string")
    out = pagerank(df, iters=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
    # iteration state is checkpointed: the final plan must be a narrow
    # projection over the checkpoint scan, not a 2-iteration join tree
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_khop_reachable_min_hops(spark):
    from pdf_extractor_spark.operators.graph import khop_reachable

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("b", "a"), ("x", "y")],
        "src string, dst string",
    )
    seeds = spark.createDataFrame([("a",)], "node string")
    got = {r.node: r.hops for r in khop_reachable(edges, seeds, k=2).collect()}
    # a(seed)=0, b=1, c=2; d is 3 hops (out of range), x/y unreachable
    assert got == {"a": 0, "b": 1, "c": 2}


def test_khop_early_exit_on_empty_frontier(spark):
    from pdf_extractor_spark.operators.graph import khop_reachable

    edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    seeds = spark.createDataFrame([("a",)], "node string")
    got = {r.node: r.hops for r in khop_reachable(edges, seeds, k=10).collect()}
    assert got == {"a": 0, "b": 1}


def test_pagerank_invariants_on_random_graph(spark):
    """On a seeded 30-node random graph: every rank >= (1-d)/N, total
    rank <= 1 + eps (mass only leaks via dangling nodes), and values
    match the plain-Python power iteration to 1e-6."""
    import random

    rng = random.Random(11)
    nodes = [f"n{i}" for i in range(30)]
    edges = sorted(
        {
            (rng.choice(nodes), rng.choice(nodes))
            for _ in range(120)
        }
    )
    edges = [(s, t) for s, t in edges if s != t]
    got = _ranks(spark, edges, iters=3)
    want = _expected(edges, iters=3)
    n = len({x for e in edges for x in e})
    assert set(got) == set(want) and len(got) == n
    for v, r in got.items():
        assert r >= (1 - 0.85) / n - 1e-9
        assert r == pytest.approx(want[v], abs=1e-6)
    assert sum(got.values()) <= 1.0 + 1e-6


def _triangles(spark, edges):
    from pdf_extractor_spark.operators.graph import triangle_count

    df = spark.createDataFrame(edges, "src string, dst string")
    return {
        r.node: (r.degree, r.triangles) for r in triangle_count(df).collect()
    }


def test_triangle_count_k4_and_pendant(spark):
    # K4: every node degree 3, in C(3,2)=3 triangles; pendant e has 0
    k4 = [
        (a, b)
        for a in "abcd"
        for b in "abcd"
        if a < b
    ]
    got = _triangles(spark, k4 + [("d", "e")])
    assert got["a"] == (3, 3) and got["b"] == (3, 3) and got["c"] == (3, 3)
    assert got["d"] == (4, 3)
    assert got["e"] == (1, 0)


def test_triangle_count_dedups_direction_and_self_loops(spark):
    # both directions + duplicates + a self loop = ONE undirected triangle
    edges = [
        ("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"),
        ("a", "c"), ("a", "c"), ("a", "a"),
    ]
    got = _triangles(spark, edges)
    assert got == {"a": (2, 1), "b": (2, 1), "c": (2, 1)}


def test_triangle_count_matches_bruteforce_on_random_graph(spark):
    import itertools
    import random

    rng = random.Random(7)
    nodes = [f"n{i}" for i in range(18)]
    und = sorted(
        {
            tuple(sorted((rng.choice(nodes), rng.choice(nodes))))
            for _ in range(70)
        }
    )
    und = [(u, v) for u, v in und if u != v]
    eset = set(und)
    want_tri = {n: 0 for n in {x for e in und for x in e}}
    for a, b, c in itertools.combinations(sorted(want_tri), 3):
        if ((a, b) in eset) and ((b, c) in eset) and ((a, c) in eset):
            for n in (a, b, c):
                want_tri[n] += 1
    got = _triangles(spark, und)
    assert {n: t for n, (_, t) in got.items()} == want_tri
