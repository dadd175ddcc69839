"""utf8_stats, interarrival_hist, host_outlink_jaccard,
cluster_label_purity — hand-computed cases."""

import datetime as dt

import numpy as np

from pdf_extractor_spark.operators.events import interarrival_hist
from pdf_extractor_spark.operators.graph import host_outlink_jaccard
from pdf_extractor_spark.operators.similarity import cluster_label_purity
from pdf_extractor_spark.operators.textstats import utf8_stats


def test_utf8_stats(spark):
    rows = [(1, "abc"), (2, "héllo"), (3, None), (4, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in utf8_stats(df).collect()}
    assert (got[1].n_chars, got[1].n_bytes, got[1].pure_ascii) == (3, 3, True)
    # é is 2 bytes: 5 chars, 6 bytes
    assert (got[2].n_chars, got[2].n_bytes) == (5, 6)
    assert got[2].pure_ascii is False
    assert abs(got[2].multibyte_ratio - 0.2) < 1e-9
    assert (got[3].n_chars, got[3].multibyte_ratio, got[3].pure_ascii) == (
        0, 0.0, True,
    )
    assert got[4].pure_ascii is True


def test_interarrival_hist(spark):
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, t0, 1, "view", None),
        (2, t0 + dt.timedelta(seconds=1), 1, "view", None),   # gap 1 -> b1
        (3, t0 + dt.timedelta(seconds=8), 1, "view", None),   # gap 7 -> b3
        (4, t0, 1, "click", None),                            # other type
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    got = {(r.event_type, r.bucket): r for r in interarrival_hist(df).collect()}
    # gap 1s: log2(2) = 1 -> bucket 1; gap 7s: log2(8) = 3 -> bucket 3
    assert got[("view", 1)].n == 1 and got[("view", 1)].min_gap_s == 1.0
    assert got[("view", 3)].n == 1 and got[("view", 3)].max_gap_s == 7.0
    assert ("click", 0) not in got  # single event -> no gap


def test_host_outlink_jaccard(spark):
    pairs = [
        ("a", "x"), ("a", "y"), ("a", "z"),
        ("b", "x"), ("b", "y"),            # J(a,b) = 2/3
        ("c", "q"),                        # disjoint
    ]
    e = spark.createDataFrame(pairs, "src string, dst string")
    out = host_outlink_jaccard(e, min_jaccard=0.2).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.host_a, r.host_b, r.n_common, r.n_a, r.n_b) == ("a", "b", 2, 3, 2)
    assert abs(r.jaccard - round(2 / 3, 6)) < 1e-9


def test_host_outlink_jaccard_max_df_guard(spark):
    # dst 'hub' linked by every host: with max_df=2 it is dropped and no
    # pair survives on it
    pairs = [(h, "hub") for h in ("a", "b", "c")] + [("a", "u"), ("b", "u")]
    e = spark.createDataFrame(pairs, "src string, dst string")
    out = host_outlink_jaccard(e, min_jaccard=0.1, max_df=2).collect()
    # only 'u' (df 2) survives; a and b each have 1 surviving outlink
    assert len(out) == 1
    assert out[0].n_common == 1 and out[0].jaccard == 1.0


def test_cluster_label_purity(spark):
    # two obvious clusters along axis 0/1; labels match clusters except
    # one impure vector
    rows = [
        (0, [1.0, 0.0], 10),
        (1, [0.9, 0.1], 10),
        (2, [1.0, 0.1], 20),   # impurity in cluster A
        (3, [0.0, 1.0], 30),
        (4, [0.1, 0.9], 30),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    cents = np.array([[1.0, 0.0], [0.0, 1.0]])
    got = {r.cluster: r for r in cluster_label_purity(
        df, n_clusters=2, centroids=cents
    ).collect()}
    a = got[0]
    assert a.n_vecs == 3 and a.majority_label == 10
    assert abs(a.purity - round(2 / 3, 6)) < 1e-9
    b = got[1]
    assert b.n_vecs == 2 and b.majority_label == 30 and b.purity == 1.0
