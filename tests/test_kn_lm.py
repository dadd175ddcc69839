"""kn_bigram_lm — interpolated Kneser-Ney bigram smoothing, exact-integer
form (curation.kn_bigram_lm): hand-computed case + a brute-force python
recomputation on a synthetic corpus."""

from collections import Counter

import pytest
from pyspark.sql import functions as F  # noqa: F401

from pdf_extractor_spark.operators.curation import kn_bigram_lm


def _py_kn(texts, top_n=50):
    c12 = Counter()
    for t in texts:
        toks = t.lower().split()
        for a, b in zip(toks, toks[1:]):
            c12[(a, b)] += 1
    B = len(c12)
    c1 = Counter()
    n_follow = Counter()
    n_prec = Counter()
    for (a, b), c in c12.items():
        c1[a] += c
        n_follow[a] += 1
        n_prec[b] += 1
    top = sorted(c12.items(), key=lambda kv: (-kv[1], kv[0]))[:top_n]
    out = {}
    for r, ((a, b), c) in enumerate(top, 1):
        num = max(4 * c - 3, 0) * B + 3 * n_follow[a] * n_prec[b]
        out[(a, b)] = (r, c, c1[a], n_follow[a], n_prec[b],
                       round(num / (4 * c1[a] * B), 6))
    return out


def test_kn_hand_computed(spark):
    docs = spark.createDataFrame(
        [(1, "a b a b c"), (2, "b a b")], "doc_id long, text string"
    )
    rows = {(r["w1"], r["w2"]): r for r in kn_bigram_lm(docs).collect()}
    # c12: (a,b)=3 (b,a)=2 (b,c)=1; B=3; c1[a]=3 c1[b]=3;
    # n_follow[a]=1 n_follow[b]=2; n_prec[a]=n_prec[b]=n_prec[c]=1
    ab = rows[("a", "b")]
    assert (ab["rank"], ab["c12"], ab["c1"], ab["n_follow"],
            ab["n_prec"]) == (1, 3, 3, 1, 1)
    # (max(3-0.75,0)*3 + 0.75*1*1) / (3*3) = 30/36
    assert ab["p_kn"] == pytest.approx(0.833333)
    assert rows[("b", "a")]["p_kn"] == pytest.approx(0.583333)  # 21/36
    assert rows[("b", "c")]["p_kn"] == pytest.approx(0.25)  # 9/36


def test_kn_matches_bruteforce(spark):
    texts = [
        " ".join(
            f"w{(i * j * 7 + j * j) % 13}" for j in range(3 + i % 9)
        )
        for i in range(120)
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    want = _py_kn(texts)
    got = {
        (r["w1"], r["w2"]): (r["rank"], r["c12"], r["c1"], r["n_follow"],
                             r["n_prec"], r["p_kn"])
        for r in kn_bigram_lm(docs).collect()
    }
    assert got == want


def test_kn_probabilities_normalize(spark):
    """For a context with every observed successor reported, the KN
    probabilities must sum to at most 1 (the discount mass held back for
    unseen continuations keeps the sum strictly below 1 whenever the
    vocabulary has unseen successors)."""
    docs = spark.createDataFrame(
        [(1, "x a x b x c x a x b"), (2, "y a y b")],
        "doc_id long, text string",
    )
    rows = kn_bigram_lm(docs, top_n=1000).collect()
    by_ctx = {}
    for r in rows:
        by_ctx.setdefault(r["w1"], []).append(r["p_kn"])
    for ctx, ps in by_ctx.items():
        assert sum(ps) <= 1.0 + 1e-9, (ctx, ps)


def test_kn_perplexity_bruteforce(spark):
    import math

    texts = {i: " ".join(f"w{(i * j * 5 + j) % 7}" for j in range(2 + i % 6))
             for i in range(40)}
    texts[40] = "solo"          # < 2 tokens -> (0, 0.0, 1.0)
    texts[41] = ""              # empty text
    from pdf_extractor_spark.operators.curation import kn_perplexity

    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    model = _py_kn([t for t in texts.values()], top_n=10**9)
    want = {}
    for i, t in texts.items():
        toks = t.lower().split()
        lps = []
        for a, b in zip(toks, toks[1:]):
            # recompute UNROUNDED p (the operator rounds only the mean)
            r, c, c1, nf, np_, _p = model[(a, b)]
            B = len(model)
            lps.append(math.log(
                (max(4 * c - 3, 0) * B + 3 * nf * np_) / (4 * c1 * B)))
        if lps:
            h = -sum(lps) / len(lps)
            want[i] = (len(lps), round(h, 6), round(math.exp(h), 4))
        else:
            want[i] = (0, 0.0, 1.0)
    got = {
        r["doc_id"]: (r["n_trans"], r["kn_cross_entropy"],
                      r["kn_perplexity"])
        for r in kn_perplexity(docs).collect()
    }
    for i in want:
        assert got[i][0] == want[i][0], i
        assert got[i][1] == pytest.approx(want[i][1], abs=2e-6), i
        assert got[i][2] == pytest.approx(want[i][2], abs=2e-4), i
