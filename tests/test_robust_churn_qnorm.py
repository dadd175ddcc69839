"""embedding_quantile_norm, churn_detect, robust_value_stats — hand
computed cases."""

import datetime as dt

from pdf_extractor_spark.operators.events import (
    churn_detect,
    robust_value_stats,
)
from pdf_extractor_spark.operators.similarity import embedding_quantile_norm


def test_embedding_quantile_norm(spark):
    rows = [
        (1, [0.1, 9.0]),
        (2, [0.2, 3.0]),
        (3, [0.3, 6.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {(r.vec_id, r.dim): r for r in embedding_quantile_norm(df).collect()}
    assert len(got) == 6
    # dim 0 order: .1 < .2 < .3 -> ranks 0, .5, 1
    assert got[(1, 0)].qnorm == 0.0
    assert got[(2, 0)].qnorm == 0.5
    assert got[(3, 0)].qnorm == 1.0
    # dim 1 order: 3 < 6 < 9 -> vec 2 lowest
    assert got[(2, 1)].qnorm == 0.0
    assert got[(1, 1)].qnorm == 1.0


def test_churn_detect(spark):
    t = dt.datetime(2024, 1, 20)
    rows = [
        # user 1: 3 events, last 10 days before anchor -> churned
        (1, dt.datetime(2024, 1, 10), 1, "view", None),
        (2, dt.datetime(2024, 1, 10), 1, "view", None),
        (3, dt.datetime(2024, 1, 10), 1, "view", None),
        # user 2: active at anchor
        (4, t, 2, "view", None),
        # user 3: old but only 1 event -> not churned (noise)
        (5, dt.datetime(2024, 1, 1), 3, "view", None),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    got = {r.user_id: r for r in churn_detect(df, 7, 3).collect()}
    assert got[1].churned is True and got[1].last_day == "2024-01-10"
    assert got[2].churned is False
    assert got[3].churned is False and got[3].n_events == 1


def test_robust_value_stats(spark):
    # 10 values 1..9 plus outlier 1000; trim=0.1 -> k=1: drop min and max
    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 1000.0]
    rows = [
        (i, dt.datetime(2024, 1, 1), 1, "purchase", v)
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    r = robust_value_stats(df, 0.1).collect()[0]
    kept = vals[1:9]  # 2..9
    assert r.n_values == 10
    assert abs(r.trimmed_mean - round(sum(kept) / 8, 6)) < 1e-9
    winsor = (sum(kept) + 1 * 2.0 + 1 * 9.0) / 10
    assert abs(r.winsor_mean - round(winsor, 6)) < 1e-9


def test_robust_value_stats_tiny_group(spark):
    rows = [
        (1, dt.datetime(2024, 1, 1), 1, "error", 5.0),
        (2, dt.datetime(2024, 1, 1), 1, "error", 7.0),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    r = robust_value_stats(df, 0.1).collect()[0]
    # k = floor(2*0.1) = 0 -> nothing trimmed; both stats = plain mean
    assert r.trimmed_mean == 6.0 and r.winsor_mean == 6.0
