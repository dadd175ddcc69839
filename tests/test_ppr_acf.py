"""personalized_pagerank and autocorrelation — hand-computed cases."""

import datetime as dt

from pdf_extractor_spark.operators.events import autocorrelation
from pdf_extractor_spark.operators.graph import personalized_pagerank


def test_ppr_seed_concentration(spark):
    # chain s -> a -> b plus far node x -> y; restart at s keeps all
    # mass in s's component
    e = spark.createDataFrame(
        [("s", "a"), ("a", "b"), ("x", "y")], "src string, dst string"
    )
    seeds = spark.createDataFrame([("s",)], "host string")
    got = {r.node: r.rank for r in personalized_pagerank(
        e, seeds, iters=3, damping=0.85
    ).collect()}
    assert got["x"] == 0.0 and got["y"] == 0.0
    assert got["s"] == 0.15  # restart mass only (nothing links to s)
    # a receives damped mass from s each round: 0.85 * rank(s)
    assert got["a"] > 0.1 and got["b"] > 0.0
    # seed neighborhood dominates
    assert got["s"] + got["a"] + got["b"] > 0.3


def test_ppr_two_seeds_split_restart(spark):
    e = spark.createDataFrame(
        [("s1", "a"), ("s2", "a")], "src string, dst string"
    )
    seeds = spark.createDataFrame([("s1",), ("s2",)], "host string")
    got = {r.node: r.rank for r in personalized_pagerank(
        e, seeds, iters=1, damping=0.85
    ).collect()}
    # each seed restarts with 0.5: rank = 0.15*0.5 = 0.075
    assert got["s1"] == got["s2"] == 0.075
    # a: 0.85 * (0.5 + 0.5) after round 1
    assert abs(got["a"] - 0.85) < 1e-9


def test_autocorrelation(spark):
    # strict weekly sawtooth: high on day%7==0. acf(7)=1, acf(1)<1
    rows = []
    eid = 0
    for d in range(28):
        n = 20 if d % 7 == 0 else 5
        for j in range(n):
            rows.append(
                (eid, dt.datetime(2024, 1, 1 + d, 8, j % 60), 1, "view", None)
            )
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    got = {r.lag: r for r in autocorrelation(df, lags=(1, 7, 14)).collect()}
    assert got[7].acf == 1.0 and got[14].acf == 1.0
    assert got[1].acf < 0.5
    assert got[7].n_pairs == 21
