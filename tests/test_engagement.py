"""dau_wau_stickiness, gini_value, user_entropy, ewma_daily — hand
computed parity cases."""

import datetime as dt
import math

from pdf_extractor_spark.operators.events import (
    dau_wau_stickiness,
    ewma_daily,
    gini_value,
    user_entropy,
)


def _ts(day, h=9):
    return dt.datetime(2024, 1, day, h, 0, 0)


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def test_dau_wau_stickiness(spark):
    rows = [
        (1, _ts(1), 10, "view", None),
        (2, _ts(1), 11, "view", None),
        (3, _ts(1, 12), 10, "click", None),  # same user+day -> 1 user-day
        (4, _ts(3), 10, "view", None),
        (5, _ts(10), 12, "view", None),      # outside day-3's window
    ]
    got = {r.day: r for r in dau_wau_stickiness(_df(spark, rows), 7).collect()}
    assert set(got) == {"2024-01-01", "2024-01-03", "2024-01-10"}
    # day 1: users {10,11}; trailing 7d window = day 1 only
    assert (got["2024-01-01"].dau, got["2024-01-01"].wau) == (2, 2)
    # day 3: dau {10}; window days 1..3 -> users {10,11}
    assert (got["2024-01-03"].dau, got["2024-01-03"].wau) == (1, 2)
    assert got["2024-01-03"].stickiness == 0.5
    # day 10: window days 4..10 -> only user 12
    assert (got["2024-01-10"].dau, got["2024-01-10"].wau) == (1, 1)


def test_gini_value(spark):
    rows = [
        (1, _ts(1), 1, "purchase", 1.0),
        (2, _ts(1), 1, "purchase", 1.0),
        (3, _ts(1), 1, "purchase", 1.0),
        (4, _ts(1), 1, "error", 0.0),
        (5, _ts(1), 1, "error", 0.0),
        (6, _ts(1), 1, "click", 10.0),
        (7, _ts(2), 2, "click", 0.0),
        (8, _ts(2), 2, "view", 5.0),
        (9, _ts(2), 2, "view", None),  # nulls excluded
    ]
    got = {r.event_type: r for r in gini_value(_df(spark, rows)).collect()}
    # equal distribution -> gini 0: 2*(1+2+3)/(3*3) - 4/3 = 0
    assert got["purchase"].gini == 0.0
    assert got["purchase"].total_value == 3.0
    # all-zero total -> guarded 0
    assert got["error"].gini == 0.0
    # maximal concentration with n=2 (0, 10): 2*(0*1+10*2)/(2*10) - 3/2 = .5
    assert got["click"].gini == 0.5
    # singleton group guarded to 0
    assert got["view"].n_values == 1 and got["view"].gini == 0.0


def test_user_entropy(spark):
    rows = [
        (1, _ts(1), 1, "view", None),
        (2, _ts(1), 1, "view", None),
        (3, _ts(1), 1, "click", None),
        (4, _ts(1), 1, "click", None),
        (5, _ts(1), 2, "view", None),
    ]
    got = {r.user_id: r for r in user_entropy(_df(spark, rows)).collect()}
    # user 1: 2+2 events over 2 types -> 1 bit
    assert (got[1].n_events, got[1].n_types, got[1].entropy) == (4, 2, 1.0)
    # user 2: single type -> 0 bits
    assert (got[2].n_events, got[2].n_types, got[2].entropy) == (1, 1, 0.0)


def test_ewma_daily(spark):
    rows = [
        (1, _ts(1), 1, "view", None),
        (2, _ts(1), 2, "view", None),  # day 1: n=2
        (3, _ts(2), 1, "view", None),  # day 2: n=1
        (4, _ts(4), 1, "view", None),  # day 4: n=1 (day 3 absent)
    ]
    got = {r.day: r for r in ewma_daily(_df(spark, rows), 0.3, 14).collect()}
    assert got["2024-01-01"].ewma == 2.0  # only itself in window
    # day 2: (1*1 + 2*0.7) / (1 + 0.7)
    exp2 = (1 + 2 * 0.7) / 1.7
    assert abs(got["2024-01-02"].ewma - round(exp2, 6)) < 1e-9
    # day 4 window holds days 1,2,4 with ages 3,2,0
    exp4 = (1 * 1 + 1 * 0.7**2 + 2 * 0.7**3) / (1 + 0.7**2 + 0.7**3)
    assert abs(got["2024-01-04"].ewma - round(exp4, 6)) < 1e-9
    assert abs(
        got["2024-01-04"].ratio - round(1 / exp4, 6)
    ) < 1e-9
    # entropy of weights: ratio on day 1 = 2/2 = 1
    assert got["2024-01-01"].ratio == 1.0


def test_entropy_matches_math(spark):
    rows = [
        (1, _ts(1), 7, "a", None),
        (2, _ts(1), 7, "a", None),
        (3, _ts(1), 7, "b", None),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    r = user_entropy(df).collect()[0]
    expected = -(2 / 3) * math.log2(2 / 3) - (1 / 3) * math.log2(1 / 3)
    assert abs(r.entropy - round(expected, 6)) < 1e-9
