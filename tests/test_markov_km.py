"""markov_stationary and kaplan_meier — hand-computed cases."""

import datetime as dt

from pdf_extractor_spark.operators.events import (
    kaplan_meier,
    markov_stationary,
)


def _df(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )


def test_markov_stationary_two_state_flipflop(spark):
    # a->b, b->a deterministic chain: pi stays uniform (0.5, 0.5)
    t = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for u in range(3):
        for i, et in enumerate(["a", "b", "a", "b", "a"]):
            rows.append((eid, t + dt.timedelta(minutes=i), u, et, None))
            eid += 1
    got = {r.event_type: r.pi for r in markov_stationary(_df(spark, rows), 3).collect()}
    assert abs(got["a"] - 0.5) < 1e-9 and abs(got["b"] - 0.5) < 1e-9


def test_markov_stationary_absorbing_sink(spark):
    # a always -> b; b has no outgoing (sink keeps mass): after 1 iter all
    # of a's mass is at b and stays
    t = dt.datetime(2024, 1, 1)
    rows = [
        (1, t, 1, "a", None),
        (2, t + dt.timedelta(minutes=1), 1, "b", None),
        (3, t, 2, "a", None),
        (4, t + dt.timedelta(minutes=1), 2, "b", None),
    ]
    got = {r.event_type: r.pi for r in markov_stationary(_df(spark, rows), 3).collect()}
    assert got["a"] == 0.0 and got["b"] == 1.0


def test_kaplan_meier(spark):
    t = dt.datetime(2024, 1, 1, 0, 0)
    h = dt.timedelta(hours=1)
    rows = [
        # user 1: converts at 1h
        (1, t, 1, "view", None), (2, t + h, 1, "purchase", None),
        # user 2: converts at 3h
        (3, t, 2, "view", None), (4, t + 3 * h, 2, "purchase", None),
        # user 3: censored at 2h (no purchase)
        (5, t, 3, "view", None), (6, t + 2 * h, 3, "view", None),
        # user 4: censored immediately (single event, duration 0)
        (7, t, 4, "view", None),
    ]
    got = {r.t_hours: r for r in kaplan_meier(_df(spark, rows)).collect()}
    # conversion times: 1h (d=1) and 3h (d=1)
    assert set(got) == {1, 3}
    r1 = got[1]
    # at risk at t=1: users with duration >= 1 -> users 1,2,3 = 3
    assert (r1.n_risk, r1.d_events) == (3, 1)
    assert abs(r1.survival - round(1 - 1 / 3, 6)) < 1e-9
    r3 = got[3]
    # at risk at t=3: only user 2
    assert (r3.n_risk, r3.d_events) == (1, 1)
    # survival hits 0 once the last at-risk user converts
    assert r3.survival == 0.0
