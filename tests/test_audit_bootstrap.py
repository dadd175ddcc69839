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


def test_bootstrap_ci_python_reference(spark):
    """Exact parity with a python replay of the one-md5 + Weyl-shift
    Poisson draws."""
    import datetime as dt
    import hashlib

    rows = [
        (i, dt.datetime(2024, 1, 1), 1, "error" if i % 3 == 0 else "view", None)
        for i in range(30)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    B = 16
    phi = 0.6180339887498949
    thresholds = [
        0.3678794411714423, 0.7357588823428846, 0.9196986029286058,
        0.9810118431238462, 0.9963401531726563,
    ]
    means = []
    hs = {
        i: int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
        / float(1 << 60)
        for i in range(30)
    }
    import math

    for b in range(B):
        wn = wx = 0
        for i in range(30):
            raw = hs[i] + phi * b
            u = raw - math.floor(raw)
            w = next(
                (k for k, t in enumerate(thresholds) if u < t), 5
            )
            wn += w
            wx += w * (0.0 if i % 3 == 0 else 1.0)
        means.append(wx / wn)
    means.sort()

    def pctl(vals, q):
        pos = (len(vals) - 1) * q
        lo = math.floor(pos)
        hi = math.ceil(pos)
        return vals[lo] + (vals[hi] - vals[lo]) * (pos - lo)

    r = bootstrap_ci(df, b=B).collect()[0]
    assert abs(r.lo95 - round(pctl(means, 0.025), 6)) < 1e-9
    assert abs(r.hi95 - round(pctl(means, 0.975), 6)) < 1e-9
