"""luhn_scan, cusum_changepoint, event_paths, rfm_segments — hand cases."""

import datetime


def test_luhn_known_numbers(spark):
    from pdf_extractor_spark.operators.curation import luhn_scan

    # 4539148803436467 is a classic valid Luhn example; flipping the
    # last digit breaks it; '123' is too short to be a candidate
    df = spark.createDataFrame(
        [
            (1, "pay 4539148803436467 now"),
            (2, "pay 4539148803436468 now"),
            (3, "code 123 only"),
            (4, "two 4539148803436467 and 79927398713 nope"),
        ],
        "doc_id long, ptext string",
    )
    got = {
        r.doc_id: (r.n_candidates, r.n_luhn_valid)
        for r in luhn_scan(df).collect()
    }
    assert got[1] == (1, 1)
    assert got[2] == (1, 0)
    assert got[3] == (0, 0)
    assert got[4] == (1, 1)  # 11-digit run is below the 13-char floor


def test_pan_synthesis_valid_invalid(spark):
    from pdf_extractor_spark.operators.curation import (
        luhn_scan,
        synthesize_pans,
    )

    df = spark.createDataFrame(
        [(i, "t") for i in range(8)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_candidates, r.n_luhn_valid)
        for r in luhn_scan(synthesize_pans(df)).collect()
    }
    for i in range(8):
        mod = i % 4
        if mod == 0:
            assert got[i] == (1, 1), i
        elif mod == 1:
            assert got[i] == (1, 0), i
        else:
            assert got[i] == (0, 0), i


def test_cusum_hand_computed(spark):
    from pdf_extractor_spark.operators.events import cusum_changepoint

    # daily counts: d1=1, d2=1, d3=4 (n_days=3, total=6)
    # scaled residuals: 3*1-6=-3, -3, 3*4-6=6
    # S: max(0,-3)=0, 0, 6 -> peak 6 on d3
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (1, t0, 1, "view"),
        (2, t0 + datetime.timedelta(days=1), 1, "view"),
        (3, t0 + datetime.timedelta(days=2), 1, "view"),
        (4, t0 + datetime.timedelta(days=2, hours=1), 2, "view"),
        (5, t0 + datetime.timedelta(days=2, hours=2), 3, "view"),
        (6, t0 + datetime.timedelta(days=2, hours=3), 4, "view"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    r = cusum_changepoint(df).collect()[0]
    assert (r.n_days, r.total, r.max_cusum_scaled) == (3, 6, 6)
    assert r.alarm_date == "2024-01-03"


def test_cusum_flat_series_no_alarm(spark):
    from pdf_extractor_spark.operators.events import cusum_changepoint

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (i, t0 + datetime.timedelta(days=i), 1, "view") for i in range(4)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    r = cusum_changepoint(df).collect()[0]
    assert (r.max_cusum_scaled, r.alarm_date) == (0, None)


def test_event_paths_hand_computed(spark):
    from pdf_extractor_spark.operators.events import event_paths

    t0 = datetime.datetime(2024, 1, 1)

    def ev(eid, s, uid, typ):
        return (eid, t0 + datetime.timedelta(seconds=s), uid, typ)

    df = spark.createDataFrame(
        [
            ev(1, 0, 1, "view"), ev(2, 1, 1, "click"), ev(3, 2, 1, "purchase"),
            ev(4, 0, 2, "view"), ev(5, 1, 2, "click"), ev(6, 2, 2, "purchase"),
            ev(7, 3, 2, "view"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    rows = event_paths(df).collect()
    got = [(r.rank, r.path, r.n) for r in rows]
    assert got[0] == (1, "view>click>purchase", 2)
    assert got[1] == (2, "click>purchase>view", 1)
    assert len(got) == 2


def test_rfm_segments_deterministic(spark):
    from pdf_extractor_spark.operators.events import rfm_segments

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    # 5 users with distinct recency/frequency/monetary profiles
    for u in range(1, 6):
        for k in range(u):  # user u has u purchases
            rows.append(
                (
                    u * 100 + k,
                    t0 + datetime.timedelta(days=u, minutes=k),
                    u,
                    "purchase",
                    float(u) * 1.5,
                )
            )
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    )
    out = rfm_segments(df, tiers=5).collect()
    # 5 users, fully distinct metrics -> 5 singleton segments
    assert len(out) == 5
    assert sum(r.n_users for r in out) == 5
    # user 5: most recent (tier 1), most frequent (1), highest spend (1)
    best = [r for r in out if (r.r_tier, r.f_tier, r.m_tier) == (1, 1, 1)]
    assert len(best) == 1 and best[0].total_cents == 5 * 750
