"""Randomized cross-checks for the round-5 graph/lexical additions:
seeded random graphs and corpora, Spark results vs independent
pure-Python reference implementations (not shared code paths).

Complements the hand-computed fixtures in test_graph_linkpred.py /
test_cc_yule_sweep.py the way test_rank_fuzz does for the rank engine:
the reference implementations below are written directly from the
published formulas, so a Spark-side plan bug (join duplication, wrong
closure, off-by-one in the wedge condition) cannot cancel out."""
import math
import random

import pytest

from pdf_extractor_spark.operators.graph import (
    adamic_adar_topk,
    clustering_coefficient,
    degree_assortativity,
    modularity,
)
from pdf_extractor_spark.operators.textstats import gt_unseen_mass, yule_k


def random_graph(seed, n_nodes=10, n_edges=18):
    rng = random.Random(seed)
    nodes = [f"v{i:02d}" for i in range(n_nodes)]
    edges = []
    for _ in range(n_edges):
        a, b = rng.sample(nodes, 2)
        edges.append((a, b))
    return edges


def undirected(edges):
    und = set()
    for a, b in edges:
        if a != b:
            und.add((a, b))
            und.add((b, a))
    return und


def py_adamic_adar(edges):
    und = undirected(edges)
    nbrs = {}
    for a, b in und:
        nbrs.setdefault(a, set()).add(b)
    deg = {n: len(s) for n, s in nbrs.items()}
    scores = {}
    for w, ns in nbrs.items():
        for u in ns:
            for v in ns:
                if u < v and v not in nbrs[u]:
                    key = (u, v)
                    cn, sc = scores.get(key, (0, 0.0))
                    scores[key] = (cn + 1, sc + 1.0 / math.log(deg[w]))
    return {k: (cn, round(sc, 6)) for k, (cn, sc) in scores.items()}


def py_assortativity(edges):
    und = undirected(edges)
    nbrs = {}
    for a, b in und:
        nbrs.setdefault(a, set()).add(b)
    deg = {n: len(s) for n, s in nbrs.items()}
    pairs = [(deg[a], deg[b]) for a, b in und]
    m = len(pairs)
    sx = sum(p[0] for p in pairs)
    sy = sum(p[1] for p in pairs)
    sxy = sum(p[0] * p[1] for p in pairs)
    sxx = sum(p[0] ** 2 for p in pairs)
    syy = sum(p[1] ** 2 for p in pairs)
    dx = m * sxx - sx * sx
    dy = m * syy - sy * sy
    if dx <= 0 or dy <= 0:
        return None
    return round((m * sxy - sx * sy) / (math.sqrt(dx) * math.sqrt(dy)), 6)


def py_lpa_modularity(edges, iters=2):
    und = undirected(edges)
    nbrs = {}
    for a, b in und:
        nbrs.setdefault(a, set()).add(b)
    labels = {n: n for n in nbrs}
    for _ in range(iters):
        labels = {
            n: min([labels[n]] + [labels[x] for x in nbrs[n]])
            for n in nbrs
        }
    deg = {n: len(s) for n, s in nbrs.items()}
    M = len(und)
    intra = sum(1 for a, b in und if labels[a] == labels[b])
    dc = {}
    for n, lab in labels.items():
        dc[lab] = dc.get(lab, 0) + deg[n]
    sdc2 = sum(v * v for v in dc.values())
    q = (M * intra - sdc2) / (M * M)
    return len(dc), M // 2, round(q, 6)


def py_clustering(edges):
    und = undirected(edges)
    nbrs = {}
    for a, b in und:
        nbrs.setdefault(a, set()).add(b)
    out = {}
    for n, ns in nbrs.items():
        d = len(ns)
        tri = sum(
            1
            for u in ns
            for v in ns
            if u < v and v in nbrs[u]
        )
        cc = round(tri / (d * (d - 1) / 2), 6) if d >= 2 else None
        out[n] = (d, tri, cc)
    return out


SEEDS = [11, 23, 37]


@pytest.mark.parametrize("seed", SEEDS)
def test_adamic_adar_fuzz(spark, seed):
    edges = random_graph(seed)
    df = spark.createDataFrame(edges, "src string, dst string")
    expected = py_adamic_adar(edges)
    got = {
        (r.host_a, r.host_b): (r.common_neighbors, r.aa_score)
        for r in adamic_adar_topk(df, top_n=10_000).collect()
    }
    assert got == expected


@pytest.mark.parametrize("seed", SEEDS)
def test_assortativity_fuzz(spark, seed):
    edges = random_graph(seed)
    df = spark.createDataFrame(edges, "src string, dst string")
    assert degree_assortativity(df).first().assortativity == py_assortativity(
        edges
    )


@pytest.mark.parametrize("seed", SEEDS)
def test_modularity_fuzz(spark, seed):
    edges = random_graph(seed)
    df = spark.createDataFrame(edges, "src string, dst string")
    row = modularity(df).first()
    communities, n_edges, q = py_lpa_modularity(edges)
    assert (row.communities, row.n_edges, row.q_modularity) == (
        communities,
        n_edges,
        q,
    )


@pytest.mark.parametrize("seed", SEEDS)
def test_clustering_coefficient_fuzz(spark, seed):
    edges = random_graph(seed)
    df = spark.createDataFrame(edges, "src string, dst string")
    expected = py_clustering(edges)
    got = {
        r.host: (r.degree, r.triangles, r.clustering_coeff)
        for r in clustering_coefficient(df).collect()
    }
    assert got == expected


@pytest.mark.parametrize("seed", SEEDS)
def test_lexical_fuzz(spark, seed):
    rng = random.Random(seed * 7)
    vocab = [f"w{i}" for i in range(30)]
    rows = [
        (
            i,
            rng.choice(["s1", "s2"]),
            " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 40))),
        )
        for i in range(40)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )
    counts = {}
    for _, src, text in rows:
        for w in text.split():
            key = (src, w)
            counts[key] = counts.get(key, 0) + 1
    for r in gt_unseen_mass(docs).collect():
        cs = [c for (s, _), c in counts.items() if s == r.source]
        n = sum(cs)
        assert (r.n_tokens, r.vocab) == (n, len(cs))
        assert (r.n1, r.n2) == (
            sum(1 for c in cs if c == 1),
            sum(1 for c in cs if c == 2),
        )
        assert r.p_unseen == round(r.n1 / n, 6)
    for r in yule_k(docs).collect():
        cs = [c for (s, _), c in counts.items() if s == r.source]
        n = sum(cs)
        sc2 = sum(c * c for c in cs)
        assert r.yule_k == round(10000.0 * (sc2 - n) / (n * n), 6)
