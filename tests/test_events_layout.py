"""Hand-computed tests for layout reading order (operators/layout.py) and
event sessionize / as-of join (operators/events.py), plus the shuffle-count
plan pins that make them scale claims rather than hopes."""

import datetime as dt

import pyspark.sql.functions as F
import pytest

from pdf_extractor_spark.operators.events import (
    asof_join,
    session_stats,
    sessionize,
)
from pdf_extractor_spark.operators.layout import assemble_text, reading_order

BOX_SCHEMA = (
    "doc_id long, box_id int, x double, y double, w double, h double,"
    " text string"
)


def test_two_column_reading_order(spark):
    # interleaved input order L0,R0,L1,R1 — reading order must be column-major
    boxes = spark.createDataFrame(
        [
            (1, 0, 0.0, 0.0, 300.0, 80.0, "L0"),
            (1, 1, 320.0, 0.0, 300.0, 80.0, "R0"),
            (1, 2, 0.0, 100.0, 300.0, 80.0, "L1"),
            (1, 3, 320.0, 100.0, 300.0, 80.0, "R1"),
        ],
        BOX_SCHEMA,
    )
    out = {r.box_id: r for r in reading_order(boxes).collect()}
    assert [out[i].col_idx for i in range(4)] == [0, 1, 0, 1]
    assert [out[i].rank for i in range(4)] == [1, 3, 2, 4]
    txt = assemble_text(reading_order(boxes)).collect()[0]
    assert txt.page_text == "L0 L1 R0 R1"
    assert txt.n_boxes == 4 and txt.n_extra_cols == 1


def test_single_column_degenerates(spark):
    boxes = spark.createDataFrame(
        [
            (2, 0, 0.0, 200.0, 640.0, 80.0, "second"),
            (2, 1, 0.0, 0.0, 640.0, 80.0, "first"),
        ],
        BOX_SCHEMA,
    )
    txt = assemble_text(reading_order(boxes)).collect()[0]
    assert txt.page_text == "first second"
    assert txt.n_extra_cols == 0


def _ts(day, hour=0, minute=0):
    return dt.datetime(2024, 1, day, hour, minute)


EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double"
)


def test_sessionize_gap_rule(spark):
    ev = spark.createDataFrame(
        [
            (1, _ts(1, 10, 0), 7, "view", None),
            (2, _ts(1, 10, 20), 7, "purchase", 5.0),
            (3, _ts(1, 10, 50), 7, "click", None),   # 30 min gap: NOT > 30
            (4, _ts(1, 11, 21), 7, "click", None),   # 31 min gap: new session
            (5, _ts(2, 9, 0), 8, "view", None),      # other user
        ],
        EVENTS_SCHEMA,
    )
    s = {r.event_id: r for r in sessionize(ev, gap_minutes=30).collect()}
    assert [s[i].session_num for i in (1, 2, 3, 4, 5)] == [1, 1, 1, 2, 1]
    assert s[4].is_session_start is True and s[3].is_session_start is False
    stats = {
        (r.user_id, r.session_num): r
        for r in session_stats(ev, gap_minutes=30).collect()
    }
    assert stats[(7, 1)].n_events == 3 and stats[(7, 1)].n_purchases == 1
    assert stats[(7, 1)].session_start == _ts(1, 10, 0)
    assert stats[(7, 1)].session_end == _ts(1, 10, 50)
    # event 4 starts session 2; no later events for user 7 within gap
    assert stats[(7, 2)].n_events == 1


def test_asof_join_semantics(spark):
    clicks = spark.createDataFrame(
        [
            (1, _ts(1, 9, 0), 7),    # before any purchase -> nulls
            (2, _ts(1, 12, 0), 7),   # equal ts -> inclusive match
            (3, _ts(1, 15, 0), 7),   # after both -> latest (12:00)
            (4, _ts(1, 15, 0), 8),   # other user, no purchases -> nulls
        ],
        "event_id long, ts timestamp, user_id long",
    )
    purchases = spark.createDataFrame(
        [
            (7, _ts(1, 10, 0), _ts(1, 10, 0), 1.0),
            (7, _ts(1, 12, 0), _ts(1, 12, 0), 2.0),
        ],
        "user_id long, ts timestamp, purchase_ts timestamp,"
        " purchase_value double",
    )
    out = {
        r.event_id: r
        for r in asof_join(
            clicks,
            purchases,
            by="user_id",
            ts_col="ts",
            payload_cols=["purchase_ts", "purchase_value"],
            left_order_col="event_id",
        ).collect()
    }
    assert out[1].asof_purchase_ts is None
    assert out[2].asof_purchase_value == 2.0  # inclusive at equal ts
    assert out[3].asof_purchase_ts == _ts(1, 12, 0)
    assert out[4].asof_purchase_value is None
    assert len(out) == 4  # left join: every click survives


def test_asof_single_shuffle_plan(spark):
    """Scale pin: the as-of join is ONE hash shuffle over the unioned
    stream — no range-probe join, no broadcast of a big side."""
    import __spark_entry__ as entry

    df = entry.queries()["asof_last_purchase"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # one exchange for the purchase pre-agg, one for the per-user window
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_session_stats_reuses_window_shuffle(spark):
    """The per-session rollup must NOT add a second shuffle on top of the
    sessionize window: HashPartitioning(user_id) already satisfies the
    (user_id, session_num) clustering."""
    import __spark_entry__ as entry

    df = entry.queries()["sessionize"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_layout_order_is_permutation(spark):
    """On the synthetic corpus the recovered rank is a real permutation of
    the input order for two-column docs (not an identity pass-through)."""
    import __spark_entry__ as entry

    df = entry.queries()["layout_order"](spark, "/root/testdata/sf0.001")
    two_col = df.filter((F.col("doc_id") % 2 == 0) & (F.col("doc_id") < 20))
    rows = two_col.orderBy("doc_id", "box_id").collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.box_id, r.rank))
    permuted = 0
    for doc, pairs in by_doc.items():
        if len(pairs) == 5:
            # input order 0,1,2,3,4 (L0,R0,L1,R1,L2) -> ranks 1,4,2,5,3
            assert [rk for _, rk in pairs] == [1, 4, 2, 5, 3]
            permuted += 1
    assert permuted > 0


def test_bucketed_range_join_boundaries(spark):
    from pdf_extractor_spark.operators.events import bucketed_range_join

    facts = spark.createDataFrame(
        [
            (1, _ts(1, 0)),    # == w_start -> included
            (2, _ts(2, 23)),   # inside
            (3, _ts(3, 0)),    # == w_end -> EXCLUDED
            (4, _ts(5, 0)),    # outside any window
        ],
        "event_id long, ts timestamp",
    )
    windows = spark.createDataFrame(
        [
            ("w1", _ts(1, 0), _ts(3, 0)),
            ("empty", _ts(4, 0), _ts(4, 0)),  # zero-length -> matches nothing
        ],
        "label string, w_start timestamp, w_end timestamp",
    )
    got = sorted(
        (r.event_id, r.label)
        for r in bucketed_range_join(
            facts, windows, "ts", "w_start", "w_end"
        ).collect()
    )
    assert got == [(1, "w1"), (2, "w1")]


def test_range_join_is_equi_join_plan(spark):
    """Scale pin: the bucketized range join must compile to a hash/merge
    EQUI-join on the bucket, never a BroadcastNestedLoopJoin (the plan a
    naive inequality join degenerates to)."""
    import __spark_entry__ as entry

    df = entry.queries()["range_join_windows"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_funnel_strictly_after_ordering(spark):
    """A user whose purchase precedes their click must not reach depth 3;
    earliest-QUALIFYING stage anchors, not earliest overall."""
    from datetime import datetime as dt

    from pdf_extractor_spark.operators.events import funnel_conversion

    rows = [
        # u1: clean view -> click -> purchase
        (1, dt(2024, 1, 1, 0), "view"),
        (1, dt(2024, 1, 1, 1), "click"),
        (1, dt(2024, 1, 1, 2), "purchase"),
        # u2: purchase BEFORE click -> reaches depth 2 only
        (2, dt(2024, 1, 1, 0), "view"),
        (2, dt(2024, 1, 1, 1), "purchase"),
        (2, dt(2024, 1, 1, 2), "click"),
        # u3: click before view -> depth 1 only (view exists, click later missing)
        (3, dt(2024, 1, 1, 0), "click"),
        (3, dt(2024, 1, 1, 1), "view"),
        # u4: equal timestamps are NOT strictly after
        (4, dt(2024, 1, 1, 0), "view"),
        (4, dt(2024, 1, 1, 0), "click"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    out = {r.depth: r.n_users for r in funnel_conversion(df).collect()}
    assert out == {1: 4, 2: 2, 3: 1}


def test_retention_cohort_cells(spark):
    from datetime import datetime as dt

    from pdf_extractor_spark.operators.events import retention_cohorts

    rows = [
        (1, dt(2024, 1, 1, 5)), (1, dt(2024, 1, 3, 1)),
        (2, dt(2024, 1, 1, 9)), (2, dt(2024, 1, 1, 23)),
        (3, dt(2024, 1, 3, 0)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    cells = {
        (str(r.cohort_date), r.day_offset): r.n_users
        for r in retention_cohorts(df).collect()
    }
    assert cells == {
        ("2024-01-01", 0): 2,   # u1+u2 on day 0
        ("2024-01-01", 2): 1,   # u1 back on day 2
        ("2024-01-03", 0): 1,   # u3 cohort of its own
    }


def test_key_skew_stats_hand_computed(spark):
    """Counts: a=4, b=2, c=2, d=1, e=1 -> n_keys 5, total 10, max 4.
    Ranks (q over n_keys-1=4): p50 -> rank 3 -> count 2; p90 -> rank 4 ->
    count 2 (cum at c=2 is 4); p99 -> rank 4 -> 2."""
    from pdf_extractor_spark.operators.events import key_skew_stats

    rows = (
        [(i, "a") for i in range(4)]
        + [(10, "b"), (11, "b"), (20, "c"), (21, "c"), (30, "d"), (40, "e")]
    )
    df = spark.createDataFrame(rows, "event_id long, user_id string")
    out = {r.metric: r.value for r in key_skew_stats(df).collect()}
    assert out == {
        "n_keys": 5.0,
        "total_rows": 10.0,
        "max_count": 4.0,
        "top1_share": 0.4,
        "p50_count": 2.0,
        "p90_count": 2.0,
        "p99_count": 2.0,
    }


def test_salted_join_equals_plain_join_and_salts_the_key(spark):
    from pdf_extractor_spark.operators.events import salted_join

    facts = spark.createDataFrame(
        [(i, "hot" if i % 10 < 9 else f"u{i}") for i in range(200)],
        "event_id long, user_id string",
    )
    dim = facts.groupBy("user_id").count().withColumnRenamed("count", "n")
    salted = salted_join(facts, dim, "user_id", salt=4)
    plain = facts.join(dim, "user_id")
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "_salt" in plan  # the shuffle key really is (key, salt)


def test_event_dedup_lag_semantics(spark):
    from datetime import datetime

    from pdf_extractor_spark.operators.events import event_dedup

    rows = [
        # user 1 click: three rapid fires -> 2nd and 3rd are dups (lag
        # semantics: each within 1h of its predecessor)
        (1, 1, "click", datetime(2024, 1, 1, 0, 0, 0)),
        (2, 1, "click", datetime(2024, 1, 1, 0, 30, 0)),
        (3, 1, "click", datetime(2024, 1, 1, 1, 15, 0)),
        # >1h after the previous click -> kept
        (4, 1, "click", datetime(2024, 1, 1, 3, 0, 0)),
        # other type within the window -> unaffected
        (5, 1, "view", datetime(2024, 1, 1, 0, 10, 0)),
        # other user -> unaffected
        (6, 2, "click", datetime(2024, 1, 1, 0, 5, 0)),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp_ntz"
    )
    got = {r.event_id: r.is_dup for r in event_dedup(df).collect()}
    assert got == {1: False, 2: True, 3: True, 4: False, 5: False, 6: False}


def test_daily_anomaly_flags_spike(spark, monkeypatch, tmp_path):
    import datetime as dt
    import os

    # 10 mildly-varying days then a 10x spike day: only the spike is
    # anomalous (a CONSTANT baseline has zero spread -> never flagged)
    rows, eid = [], 0
    base = dt.datetime(2024, 1, 1)
    for day in range(11):
        n = (95 + (day * 7) % 11) if day < 10 else 1000
        for _ in range(n):
            rows.append((eid, base + dt.timedelta(days=day, seconds=eid % 86400), 1, "click", 1.0, "{}"))
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    import __spark_entry__ as entry

    got = {r.date: r.anomaly for r in entry.queries()["daily_anomaly"](spark, str(tmp_path)).collect()}
    assert got["2024-01-11"] is True
    assert sum(got.values()) == 1  # steady days (incl. zero-spread) stay quiet


# ---- resample_locf: hourly gap-fill + carry-forward ----

def test_resample_locf_hand_computed(spark):
    from datetime import datetime

    from pdf_extractor_spark.operators.events import resample_locf

    rows = [
        # user 1: events at 00:10 (v=1.0), 00:50 (v=2.0), 03:20 (v=None)
        (1, 1, datetime(2024, 1, 1, 0, 10), 1.0),
        (2, 1, datetime(2024, 1, 1, 0, 50), 2.0),
        (3, 1, datetime(2024, 1, 1, 3, 20), None),
        # user 2: single event -> single-bucket grid
        (4, 2, datetime(2024, 1, 1, 5, 0), 7.0),
        # null user and null ts rows are dropped
        (5, None, datetime(2024, 1, 1, 0, 0), 9.0),
        (6, 3, None, 9.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp_ntz, value double"
    )
    out = {
        (r.user_id, r.hour_ts.hour): (r.n_events, r.value_locf)
        for r in resample_locf(df).collect()
    }
    assert out == {
        (1, 0): (2, 2.0),   # last event of the hour wins (00:50 over 00:10)
        (1, 1): (0, 2.0),   # gap hour: zero events, value carried
        (1, 2): (0, 2.0),
        (1, 3): (1, 2.0),   # hour has an event but NULL value -> carry
        (2, 5): (1, 7.0),
    }
    assert len(out) == 5


# ---- ab_test: md5-parity arms + windowed conversion + pooled z ----

def test_ab_test_hand_computed(spark):
    import hashlib
    import math
    from datetime import datetime, timedelta

    from pdf_extractor_spark.operators.events import ab_test

    t0 = datetime(2024, 1, 10, 12, 0)
    rows = [
        # user 1: converts (purchase 1h after first click)
        (1, t0, 1, "click", 1.0, "{}"),
        (2, t0 + timedelta(hours=1), 1, "purchase", 5.0, "{}"),
        # user 2: purchase OUTSIDE the 72h window -> not converted
        (3, t0, 2, "click", 1.0, "{}"),
        (4, t0 + timedelta(hours=100), 2, "purchase", 5.0, "{}"),
        # user 3: purchase BEFORE exposure -> not converted
        (5, t0, 3, "click", 1.0, "{}"),
        (6, t0 - timedelta(hours=1), 3, "purchase", 5.0, "{}"),
        # user 4: exposed, never purchases
        (7, t0, 4, "click", 1.0, "{}"),
        # user 5: purchases but never clicks -> not in the experiment
        (8, t0, 5, "purchase", 5.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    got = ab_test(df).collect()[0]

    # arms derived from the operator's own contract, not hardcoded
    arms = {
        u: int(hashlib.md5(f"ab1_{u}".encode()).hexdigest()[:15], 16) % 2
        for u in (1, 2, 3, 4)
    }
    conv = {1: 1, 2: 0, 3: 0, 4: 0}
    n_a = sum(1 for u in arms if arms[u] == 0)
    n_b = sum(1 for u in arms if arms[u] == 1)
    c_a = sum(conv[u] for u in arms if arms[u] == 0)
    c_b = sum(conv[u] for u in arms if arms[u] == 1)
    assert (got.n_a, got.n_b, got.conv_a, got.conv_b) == (n_a, n_b, c_a, c_b)
    assert got.rate_a == round(c_a / n_a, 6)
    assert got.rate_b == round(c_b / n_b, 6)
    pool = (c_a + c_b) / (n_a + n_b)
    var = pool * (1 - pool) * (1 / n_a + 1 / n_b)
    z = (c_a / n_a - c_b / n_b) / math.sqrt(var)
    assert got.z_score == round(z, 6)


def test_ab_test_degenerate_all_convert_z_is_zero(spark):
    from datetime import datetime, timedelta

    from pdf_extractor_spark.operators.events import ab_test

    t0 = datetime(2024, 1, 10, 12, 0)
    rows = []
    eid = 0
    for u in (1, 4):  # arms 0 and 1 per md5 parity; both convert
        rows.append((eid, t0, u, "click", 1.0, "{}")); eid += 1
        rows.append((eid, t0 + timedelta(hours=2), u, "purchase", 5.0, "{}")); eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    got = ab_test(df).collect()[0]
    assert (got.rate_a, got.rate_b) == (1.0, 1.0)
    assert got.z_score == 0.0  # zero pooled variance -> z defined as 0


# ---- dow_seasonality: chi-square vs uniform week ----

def test_dow_seasonality_hand_computed(spark):
    from datetime import datetime

    from pdf_extractor_spark.operators.events import dow_seasonality

    # 2024-01-01 is a Monday (Spark dayofweek=2), 2024-01-07 a Sunday (=1)
    rows = [
        (1, datetime(2024, 1, 1, 9, 0), 1, "click", 1.0, "{}"),
        (2, datetime(2024, 1, 1, 10, 0), 1, "click", 1.0, "{}"),
        (3, datetime(2024, 1, 8, 11, 0), 1, "click", 1.0, "{}"),  # also Monday
        (4, datetime(2024, 1, 7, 9, 0), 2, "click", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    out = {r.dow: r for r in dow_seasonality(df).collect()}
    assert set(out) == {1, 2}
    assert out[2].n_events == 3 and out[1].n_events == 1
    # expected = 4 events / 2 observed dows = 2; chi2 = (1 + 1) / 2 = 1
    assert out[1].expected == 2.0 and out[2].expected == 2.0
    assert out[1].chi2 == 1.0 and out[2].chi2 == 1.0


# ---- event_transitions: per-user Markov pairs ----

def test_event_transitions_hand_computed(spark):
    from datetime import datetime, timedelta

    from pdf_extractor_spark.operators.events import event_transitions

    t0 = datetime(2024, 1, 1, 0, 0)
    rows = [
        # user 1: click -> view -> click
        (1, t0, 1, "click", 1.0, "{}"),
        (2, t0 + timedelta(hours=1), 1, "view", 1.0, "{}"),
        (3, t0 + timedelta(hours=2), 1, "click", 1.0, "{}"),
        # user 2: view -> view
        (4, t0, 2, "view", 1.0, "{}"),
        (5, t0 + timedelta(hours=1), 2, "view", 1.0, "{}"),
        # user 3: single event -> contributes nothing
        (6, t0, 3, "purchase", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    got = {
        (r.prev_type, r.next_type): (r.n_trans, r.prob)
        for r in event_transitions(df).collect()
    }
    assert got == {
        ("click", "view"): (1, 1.0),
        ("view", "click"): (1, 0.5),
        ("view", "view"): (1, 0.5),
    }


def test_event_transitions_ts_tie_broken_by_event_id(spark):
    from datetime import datetime

    from pdf_extractor_spark.operators.events import event_transitions

    t0 = datetime(2024, 1, 1, 0, 0)
    rows = [  # same timestamp: order must follow event_id
        (2, t0, 1, "view", 1.0, "{}"),
        (1, t0, 1, "click", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    got = {(r.prev_type, r.next_type) for r in event_transitions(df).collect()}
    assert got == {("click", "view")}


# ---- attribution_credit: linear multi-touch inside 72h ----

def test_attribution_credit_hand_computed(spark):
    from datetime import datetime, timedelta

    from pdf_extractor_spark.operators.events import attribution_credit

    d1 = datetime(2024, 1, 1, 10, 0)
    d2 = datetime(2024, 1, 2, 10, 0)
    rows = [
        # user 1: two clicks, then a purchase 2h after the second click
        (1, d1, 1, "click", 1.0, "{}"),
        (2, d2, 1, "click", 1.0, "{}"),
        (3, d2 + timedelta(hours=2), 1, "purchase", 10.0, "{}"),
        # second purchase lands 74h after the last click -> no credit
        (4, d2 + timedelta(hours=74), 1, "purchase", 8.0, "{}"),
        # user 2: click strictly AFTER its purchase -> no credit
        (5, d1, 2, "purchase", 7.0, "{}"),
        (6, d1 + timedelta(hours=1), 2, "click", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    got = {
        r.click_date: (r.n_credited_clicks, r.credited_value)
        for r in attribution_credit(df).collect()
    }
    # the 10.0 purchase splits evenly over its two in-window clicks
    assert got == {"2024-01-01": (1, 5.0), "2024-01-02": (1, 5.0)}


# ---- decayed_activity: half-life recency weighting ----

def test_decayed_activity_hand_computed(spark):
    from datetime import datetime, timedelta

    from pdf_extractor_spark.operators.events import decayed_activity

    anchor = datetime(2024, 1, 15, 0, 0)
    rows = [
        # user 1: one event AT the anchor (weight 1), one 7d old (0.5)
        (1, anchor, 1, "click", 1.0, "{}"),
        (2, anchor - timedelta(days=7), 1, "click", 1.0, "{}"),
        # user 2: one event 14d old (0.25)
        (3, anchor - timedelta(days=14), 2, "view", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    got = {
        r.user_id: (r.n_events, r.decayed_score)
        for r in decayed_activity(df).collect()
    }
    assert got == {1: (2, 1.5), 2: (1, 0.25)}
