"""dedup_audit_pairs and bootstrap_ci — hand-computed / property cases."""

import datetime as dt

from pdf_extractor_spark.operators.analytics import bootstrap_ci
from pdf_extractor_spark.operators.curation import dedup_audit_pairs


def test_dedup_audit_pairs(spark):
    long_a = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, long_a),
        (2, long_a),                     # exact dup of 1 -> jaccard 1.0
        (3, "totally different words everywhere in this one here"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup_audit_pairs(df, n=3, threshold=0.5, top_k=10).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.id1, r.id2, r.jaccard) == (1, 2, 1.0)
    assert r.text_a == long_a[:40] and r.text_b == long_a[:40]


def test_dedup_audit_topk_ordering(spark):
    base = "a b c d e f g h i j"
    rows = [(1, base), (2, base), (3, base), (4, "x y z " + base)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup_audit_pairs(df, n=3, threshold=0.1, top_k=2).collect()
    # exact-dup pairs (1,2),(1,3),(2,3) all jaccard 1; top-2 SELECTION is
    # deterministic by (jaccard desc, id1, id2) — row order after the
    # preview joins is not, so compare the set
    assert sorted((r.id1, r.id2) for r in out) == [(1, 2), (1, 3)]


def test_bootstrap_ci_brackets_mean(spark):
    rows = []
    for i in range(400):
        et = "error" if i % 4 == 0 else "view"  # true success rate .75
        rows.append((i, dt.datetime(2024, 1, 1), 1, et, None))
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    r = bootstrap_ci(df, b=100).collect()[0]
    assert (r.n, r.b, r.mean) == (400, 100, 0.75)
    # the interval must bracket the point estimate and be non-degenerate
    assert r.lo95 < 0.75 < r.hi95
    assert 0.6 < r.lo95 and r.hi95 < 0.9
    # deterministic: same inputs, same interval
    r2 = bootstrap_ci(df, b=100).collect()[0]
    assert (r2.lo95, r2.hi95) == (r.lo95, r.hi95)
