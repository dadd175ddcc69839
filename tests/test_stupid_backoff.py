"""Trigram Stupid Backoff (curation.stupid_backoff_score): every arm
of the backoff chain on a hand-built train/score pair, python replay
parity, and the too-short-doc edge."""

import math


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_backoff_chain_hand_computed(spark):
    """Train: 'a b c a b d'. Score doc exercises all four arms:
    (a b c)   seen trigram        -> c123/c12 = 1/2 (a b -> c or d)
    (b c a)   seen trigram        -> 1/1
    (c a q)   unseen tri, unseen bigram (a q), seen unigram... q unseen
              -> OOV floor 0.16/N
    (a q b)   unseen tri, unseen bigram (q b), seen unigram b
              -> 0.16 * c(b)/N = 0.16 * 2/6
    """
    from pdf_extractor_spark.operators.curation import stupid_backoff_score

    train = _df(spark, [(0, "a b c a b d")])
    score = _df(spark, [(1, "a b c a q b")])
    out = stupid_backoff_score(train, score).collect()
    assert len(out) == 1
    r = out[0]
    assert r.doc_id == 1 and r.n_trigrams == 4
    n = 6.0
    expected = (
        math.log(1.0 / 2.0)        # a b c
        + math.log(1.0 / 1.0)      # b c a
        + math.log(0.4 * 0.4 / n)  # c a q : q unseen anywhere
        + math.log(0.4 * 0.4 * 2.0 / n)  # a q b : backoff to unigram b
    ) / 4.0
    assert abs(r.avg_logscore - round(expected, 6)) < 1e-9


def test_bigram_backoff_arm(spark):
    """(x b c): trigram (x b c) unseen but bigram (b c) seen ->
    0.4 * c(b c)/c(b)."""
    from pdf_extractor_spark.operators.curation import stupid_backoff_score

    train = _df(spark, [(0, "a b c a b d x b")])
    score = _df(spark, [(1, "x b c")])
    r = stupid_backoff_score(train, score).collect()[0]
    # c(b c) = 1, c(b ·) = 3 (b c, b d, b is last? no: pairs b->c, b->d;
    # x->b; trailing b has no successor) -> c2 = 2
    expected = math.log(0.4 * 1.0 / 2.0)
    assert r.n_trigrams == 1
    assert abs(r.avg_logscore - round(expected, 6)) < 1e-9


def test_short_docs_absent(spark):
    from pdf_extractor_spark.operators.curation import stupid_backoff_score

    train = _df(spark, [(0, "a b c d")])
    score = _df(spark, [(1, "a b"), (2, ""), (3, None), (4, "a b c")])
    got = {r.doc_id: r.n_trigrams for r in
           stupid_backoff_score(train, score).collect()}
    assert got == {4: 1}


def test_python_replay_on_corpus(spark):
    """Full replay of the count tables + backoff chain in python on the
    sf0.001 even/odd split."""
    from pyspark.sql import functions as F

    from pdf_extractor_spark.operators.curation import stupid_backoff_score

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = docs.select("doc_id", F.lower("text").alias("t")).collect()
    import collections

    uni = collections.Counter()
    bi = collections.Counter()
    tri = collections.Counter()
    for r in rows:
        if r.doc_id % 2 or not r.t or not r.t.strip():
            continue
        t = r.t.strip().split()
        uni.update(t)
        bi.update(zip(t, t[1:]))
        tri.update(zip(t, t[1:], t[2:]))
    c2 = collections.Counter()
    for (w2, _w3), c in bi.items():
        c2[w2] += c
    c12 = collections.Counter()
    for (w1, w2, _w3), c in tri.items():
        c12[(w1, w2)] += c
    n = float(sum(uni.values()))

    want = {}
    for r in rows:
        if r.doc_id % 2 == 0 or not r.t or not r.t.strip():
            continue
        t = r.t.strip().split()
        lns = []
        for w1, w2, w3 in zip(t, t[1:], t[2:]):
            if (w1, w2, w3) in tri:
                s = tri[(w1, w2, w3)] / c12[(w1, w2)]
            elif (w2, w3) in bi:
                s = 0.4 * bi[(w2, w3)] / c2[w2]
            elif w3 in uni:
                s = 0.4 * 0.4 * uni[w3] / n
            else:
                s = 0.4 * 0.4 / n
            lns.append(math.log(s))
        if lns:
            want[r.doc_id] = (len(lns), round(sum(lns) / len(lns), 6))

    got = {
        r.doc_id: (r.n_trigrams, r.avg_logscore)
        for r in stupid_backoff_score(
            docs.filter(F.col("doc_id") % 2 == 0),
            docs.filter(F.col("doc_id") % 2 == 1),
        ).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert abs(got[k][1] - want[k][1]) < 2e-6
