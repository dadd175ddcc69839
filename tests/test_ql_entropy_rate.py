"""query_likelihood_topk and markov_entropy_rate — hand-computed cases."""

import datetime as dt
import math

from pdf_extractor_spark.operators.events import markov_entropy_rate
from pdf_extractor_spark.operators.textstats import query_likelihood_topk


def test_query_likelihood(spark):
    rows = [
        (1, "spark spark table"),
        (2, "spark data"),
        (3, "unrelated words only"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    qs = (("qa", "spark table"),)
    out = query_likelihood_topk(df, queries=qs, k=10, mu=10.0)
    got = {r.doc_id: r for r in out.collect()}
    # doc 3 matches no term -> not a candidate
    assert set(got) == {1, 2}
    # hand-compute: C=8 tokens total; cf(spark)=3, cf(table)=1
    C = 8.0
    mu = 10.0

    def score(tf_s, tf_t, dl):
        return round(
            math.log((tf_s + mu * 3 / C) / (dl + mu))
            + math.log((tf_t + mu * 1 / C) / (dl + mu)),
            6,
        )

    assert abs(got[1].score - score(2, 1, 3)) < 1e-9
    assert abs(got[2].score - score(1, 0, 2)) < 1e-9
    # doc 1 carries both terms -> ranks first
    assert got[1].rank == 1 and got[2].rank == 2


def test_query_likelihood_oov_term_skipped(spark):
    rows = [(1, "spark stuff")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = query_likelihood_topk(
        df, queries=(("qa", "spark zzz_never_seen"),), k=10, mu=10.0
    ).collect()
    # OOV term contributes nothing (no -inf); doc still scored on 'spark'
    assert len(out) == 1
    assert math.isfinite(out[0].score)


def test_markov_entropy_rate(spark):
    # deterministic a->b->a chain: every transition certain -> H = 0,
    # perplexity 1
    t = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for u in range(3):
        for i, et in enumerate(["a", "b", "a", "b", "a"]):
            rows.append((eid, t + dt.timedelta(minutes=i), u, et, None))
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    r = markov_entropy_rate(df).collect()[0]
    assert (r.n_states, r.entropy_rate, r.perplexity) == (2, 0.0, 1.0)


def test_markov_entropy_rate_uniform(spark):
    # from 'a', next is b or c with prob 1/2 each; b,c always -> a.
    t = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for u, seq in enumerate([["a", "b", "a", "c"], ["a", "c", "a", "b"]]):
        for i, et in enumerate(seq):
            rows.append((eid, t + dt.timedelta(minutes=i), u, et, None))
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    r = markov_entropy_rate(df).collect()[0]
    # H = pi_a * ln 2 (b,c rows have zero entropy); entropy positive and
    # below ln 2
    assert 0.0 < r.entropy_rate < math.log(2) + 1e-9
    assert r.n_states == 3
