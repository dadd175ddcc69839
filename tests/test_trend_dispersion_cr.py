"""source_trend, dispersion_index, capture_recapture — hand-computed."""

import datetime as dt

from pdf_extractor_spark.operators.analytics import (
    capture_recapture,
    dispersion_index,
    source_trend,
)


def _df(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )


def test_source_trend_linear_growth(spark):
    rows = []
    eid = 0
    # 'up': counts 1,2,3,4,5 over 5 days -> slope 1, r2 1
    for d in range(5):
        for j in range(d + 1):
            rows.append((eid, dt.datetime(2024, 1, 1 + d), 1, "up", None))
            eid += 1
    # 'flat': 3/day -> slope 0
    for d in range(5):
        for j in range(3):
            rows.append((eid, dt.datetime(2024, 1, 1 + d), 1, "flat", None))
            eid += 1
    got = {r.source: r for r in source_trend(_df(spark, rows)).collect()}
    up = got["up"]
    assert (up.n_days, up.slope, up.intercept, up.r2) == (5, 1.0, 1.0, 1.0)
    fl = got["flat"]
    assert fl.slope == 0.0 and fl.r2 is None  # zero y-variance -> null r2


def test_dispersion_index(spark):
    t = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # 'even': 2 users x 5 events -> var 0, dispersion 0
    for u in range(2):
        for j in range(5):
            rows.append((eid, t, u, "even", None)); eid += 1
    # 'bursty': user 0 has 9, user 1 has 1 -> mean 5, var 16, disp 3.2
    for j in range(9):
        rows.append((eid, t, 0, "bursty", None)); eid += 1
    rows.append((eid, t, 1, "bursty", None)); eid += 1
    got = {r.event_type: r for r in dispersion_index(_df(spark, rows)).collect()}
    ev = got["even"]
    assert (ev.n_users, ev.mean_count, ev.dispersion) == (2, 5.0, 0.0)
    assert ev.overdispersed is False
    b = got["bursty"]
    assert b.var_count == 16.0 and b.dispersion == 3.2
    assert b.overdispersed is True


def test_capture_recapture(spark):
    t = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # purchasers: users 0..9; clickers: users 5..24 -> overlap 5
    for u in range(10):
        rows.append((eid, t, u, "purchase", 1.0)); eid += 1
    for u in range(5, 25):
        rows.append((eid, t, u, "click", None)); eid += 1
    r = capture_recapture(_df(spark, rows)).collect()[0]
    assert (r.n_a, r.n_b, r.n_both) == (10, 20, 5)
    assert r.estimate == 40.0  # 10*20/5
    assert abs(r.coverage - round(25 / 40.0, 4)) < 1e-9
