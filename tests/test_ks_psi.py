"""ks_test and psi_drift — hand-computed cases."""

import datetime as dt
import math

from pdf_extractor_spark.operators.analytics import ks_test, psi_drift


def _df(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )


def test_ks_identical_distributions(spark):
    t = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for v in (1.0, 2.0, 3.0, 4.0):
        rows.append((eid, t, 1, "purchase", v)); eid += 1
        rows.append((eid, t, 1, "click", v)); eid += 1
    r = ks_test(_df(spark, rows)).collect()[0]
    assert (r.n_a, r.n_b, r.ks_stat) == (4, 4, 0.0)
    assert r.reject is False


def test_ks_disjoint_distributions(spark):
    t = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for i in range(20):
        rows.append((eid, t, 1, "purchase", float(i))); eid += 1
    for i in range(20):
        rows.append((eid, t, 1, "click", 100.0 + i)); eid += 1
    r = ks_test(_df(spark, rows)).collect()[0]
    # fully separated: KS = 1
    assert r.ks_stat == 1.0
    d_crit = round(1.36 * math.sqrt(40 / 400), 6)
    assert abs(r.d_crit - d_crit) < 1e-9
    assert r.reject is True


def test_psi_no_drift(spark):
    # identical value mix in both halves -> every contrib ~ 0
    rows = []
    eid = 0
    for half, day in ((0, 1), (1, 20)):
        for i in range(100):
            rows.append(
                (eid, dt.datetime(2024, 1, day), 1, "view", float(i % 10))
            )
            eid += 1
    out = psi_drift(_df(spark, rows), n_bins=10).collect()
    psi = sum(r.contrib for r in out)
    assert abs(psi) < 1e-6
    assert sum(r.n_ref for r in out) == 100
    assert sum(r.n_cur for r in out) == 100


def test_psi_with_shift(spark):
    # second half shifted upward -> positive PSI
    rows = []
    eid = 0
    for i in range(100):
        rows.append((eid, dt.datetime(2024, 1, 1), 1, "view", float(i % 10)))
        eid += 1
    for i in range(100):
        rows.append(
            (eid, dt.datetime(2024, 1, 20), 1, "view", float(i % 10 + 5))
        )
        eid += 1
    out = psi_drift(_df(spark, rows), n_bins=10).collect()
    psi = sum(r.contrib for r in out)
    assert psi > 0.2  # conventional drift flag
