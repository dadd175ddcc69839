"""concordance, branching_entropy, kmv_set_cardinality,
seasonal_decompose — hand-computed cases."""

import datetime as dt
import hashlib
import math

from pdf_extractor_spark.operators.events import seasonal_decompose
from pdf_extractor_spark.operators.sketches import kmv_set_cardinality
from pdf_extractor_spark.operators.textstats import (
    branching_entropy,
    concordance,
)


def test_concordance(spark):
    rows = [
        (1, "a b c Spark d e f"),
        (2, "spark starts the doc"),
        (3, "ends with spark"),
        (4, "no hit here"),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.doc_id, r.pos): r for r in concordance(df, "spark", width=3).collect()}
    assert set(got) == {(1, 3), (2, 0), (3, 2)}
    r1 = got[(1, 3)]
    assert (r1.left_ctx, r1.matched, r1.right_ctx) == ("a b c", "Spark", "d e f")
    r2 = got[(2, 0)]
    assert (r2.left_ctx, r2.matched, r2.right_ctx) == ("", "spark", "starts the doc")
    r3 = got[(3, 2)]
    assert (r3.left_ctx, r3.matched, r3.right_ctx) == ("ends with", "spark", "")


def test_branching_entropy(spark):
    # contexts: "the" -> {cat, dog} 1+1; "cat" -> {sat}; ...
    rows = [(1, "the cat sat"), (2, "the dog")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.context: r for r in branching_entropy(df).collect()}
    assert (got["the"].n_total, got["the"].n_successors, got["the"].entropy) == (
        2,
        2,
        1.0,
    )
    assert got["cat"].entropy == 0.0 and got["cat"].n_total == 1


def _h60(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_kmv_exact_below_k(spark):
    # tiny sets (< k): estimates must be EXACT counts
    rows = []
    eid = 0
    for u in range(10):
        rows.append((eid, dt.datetime(2024, 1, 1), u, "a", None)); eid += 1
    for u in range(5, 20):  # b has 15 users, overlap 5
        rows.append((eid, dt.datetime(2024, 1, 1), u, "b", None)); eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    out = kmv_set_cardinality(df, k=64).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.grp_a, r.grp_b) == ("a", "b")
    assert (r.est_a, r.est_b, r.est_union) == (10.0, 15.0, 20.0)
    # intersection = jaccard (5/20) * union (20) = 5
    assert r.est_inter == 5.0


def test_kmv_estimator_above_k(spark):
    # 200 users in one group with k=16: estimate from the 16th hash
    rows = [
        (i, dt.datetime(2024, 1, 1), i, "a", None) for i in range(200)
    ] + [
        (1000 + i, dt.datetime(2024, 1, 1), i, "b", None) for i in range(200)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    r = kmv_set_cardinality(df, k=16).collect()[0]
    hashes = sorted(_h60(str(u)) for u in range(200))
    expected = round(15 * float(1 << 60) / hashes[15], 2)
    assert r.est_a == r.est_b == expected
    # identical sets: union estimate equals the per-set estimate,
    # intersection jaccard = 1
    assert r.est_union == expected and r.est_inter == expected
    # sanity: the estimator lands within 2x of truth for this seed
    assert 100 <= r.est_a <= 400


def test_seasonal_decompose(spark):
    # 14 days, flat 10/day -> trend 10 everywhere, seasonal 1, residual 1
    rows = []
    eid = 0
    for d in range(1, 15):
        for j in range(10):
            rows.append((eid, dt.datetime(2024, 1, d, 8, j), 1, "view", None))
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    out = seasonal_decompose(df).collect()
    assert len(out) == 14
    for r in out:
        assert r.n_events == 10
        assert r.trend == 10.0
        assert r.seasonal_idx == 1.0
        assert r.residual == 1.0


def test_seasonal_decompose_weekday_pattern(spark):
    # 28 days: weekends 20/day, weekdays 10/day -> seasonal_idx > 1 on
    # weekend dows, < 1 on weekday dows
    rows = []
    eid = 0
    for d in range(1, 29):
        date = dt.date(2024, 1, d)
        n = 20 if date.weekday() >= 5 else 10
        for j in range(n):
            rows.append((eid, dt.datetime(2024, 1, d, 8, j), 1, "view", None))
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    out = {r.day: r for r in seasonal_decompose(df).collect()}
    sat = out["2024-01-06"]
    mon = out["2024-01-08"]
    assert sat.seasonal_idx > 1.2 and mon.seasonal_idx < 1.0
    # residuals hover near 1 (the pattern is fully explained)
    for r in out.values():
        assert 0.7 < r.residual < 1.35


def test_branching_entropy_math(spark):
    rows = [(1, "x a x a x b")]  # context x -> {a:2, b:1}
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.context: r for r in branching_entropy(df).collect()}
    expected = -(2 / 3) * math.log2(2 / 3) - (1 / 3) * math.log2(1 / 3)
    assert abs(got["x"].entropy - round(expected, 6)) < 1e-9
    assert got["x"].n_total == 3 and got["x"].n_successors == 2
