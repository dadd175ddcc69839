"""rrf_fusion and event_trigrams — hand-computed cases."""

import datetime as dt

from pdf_extractor_spark.operators.events import event_trigrams
from pdf_extractor_spark.operators.graph import rrf_fusion


def test_rrf_fusion(spark):
    a = spark.createDataFrame(
        [("x", 3.0), ("y", 2.0), ("z", 1.0)], "host string, rank double"
    )
    b = spark.createDataFrame(
        [("y", 9.0), ("x", 5.0)], "host string, auth double"
    )
    got = {r.item: r for r in rrf_fusion(a, b, k=60).collect()}
    # x: rank_a 1, rank_b 2 -> 1/61 + 1/62
    assert (got["x"].rank_a, got["x"].rank_b) == (1, 2)
    assert abs(got["x"].rrf - round(1 / 61 + 1 / 62, 6)) < 1e-9
    # z missing from b: only the a term
    assert got["z"].rank_b is None
    assert abs(got["z"].rrf - round(1 / 63, 6)) < 1e-9
    # y: 1/62 + 1/61 == x's score; fusion is symmetric here
    assert got["y"].rrf == got["x"].rrf


def test_event_trigrams(spark):
    t = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # 3 users doing view->click->purchase; 1 user view->view->view
    for u in range(3):
        for i, et in enumerate(("view", "click", "purchase")):
            rows.append((eid, t + dt.timedelta(minutes=i), u, et, None))
            eid += 1
    for i in range(3):
        rows.append((eid, t + dt.timedelta(minutes=i), 9, "view", None))
        eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    out = event_trigrams(df, top_k=5).collect()
    assert (out[0].e1, out[0].e2, out[0].e3, out[0].n) == (
        "view", "click", "purchase", 3,
    )
    assert (out[1].e1, out[1].e2, out[1].e3, out[1].n) == (
        "view", "view", "view", 1,
    )
    # trigrams never cross users
    assert len(out) == 2
