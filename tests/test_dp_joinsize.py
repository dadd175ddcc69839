"""dp_counts and join_size_estimate — hand-computed cases."""

import datetime as dt
import hashlib
import math

from pdf_extractor_spark.operators.analytics import (
    dp_counts,
    join_size_estimate,
)


def _laplace(seed, grp, eps=1.0):
    u = (
        int(hashlib.md5(f"{seed}:{grp}".encode()).hexdigest()[:15], 16)
        / float(1 << 60)
        - 0.5
    )
    return -(1.0 / eps) * math.copysign(1, u) * math.log(1 - 2 * abs(u))


def test_dp_counts_deterministic_laplace(spark):
    rows = [
        (i, dt.datetime(2024, 1, 1), 1, "view" if i < 7 else "click", None)
        for i in range(10)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    got = {r.group: r for r in dp_counts(df, epsilon=1.0).collect()}
    assert got["view"].true_n == 7 and got["click"].true_n == 3
    for g in ("view", "click"):
        expected = _laplace("dp0", g)
        assert abs(got[g].noise - round(expected, 6)) < 1e-9
        assert got[g].noisy_n == max(
            round(got[g].true_n + round(expected, 6), 6), 0.0
        ) or abs(
            got[g].noisy_n - max(round(got[g].true_n + expected, 6), 0.0)
        ) < 1e-6
        assert got[g].epsilon == 1.0


def test_join_size_estimate_exact(spark):
    orders = spark.createDataFrame(
        [(1,), (2,), (3,)], "o_orderkey long"
    )
    li = spark.createDataFrame(
        [(1,), (1,), (2,), (9,)], "l_orderkey long"
    )
    r = join_size_estimate(orders, li, "o_orderkey", "l_orderkey").collect()[0]
    # matches: key1 1*2 + key2 1*1 = 3 pairs; key 9 unmatched
    assert r.actual_pairs == 3
    assert (r.left_keys, r.right_keys) == (3, 3)
    # uniform estimate: 3*4/max(3,3) = 4
    assert r.est_pairs == 4.0
    assert abs(r.est_err_pct - round((4 - 3) / 3 * 100, 6)) < 1e-9
    assert r.top_key_share == 1.0  # 2 keys <= top 16
