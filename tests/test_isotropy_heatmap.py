"""embedding_isotropy and dow_hour_heatmap — hand-computed cases."""

import datetime as dt
import math

from pdf_extractor_spark.operators.events import dow_hour_heatmap
from pdf_extractor_spark.operators.similarity import embedding_isotropy


def test_isotropy_balanced(spark):
    # opposite unit vectors: mean vector is 0 -> isotropy 1
    rows = [(0, [1.0, 0.0]), (1, [-1.0, 0.0]), (2, [0.0, 1.0]), (3, [0.0, -1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    r = embedding_isotropy(df).collect()[0]
    assert (r.n, r.dim) == (4, 2)
    assert r.mean_norm == 0.0 and r.avg_norm == 1.0
    assert r.isotropy == 1.0


def test_isotropy_common_direction(spark):
    # identical vectors: mean norm == avg norm -> isotropy 0
    rows = [(i, [3.0, 4.0]) for i in range(5)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    r = embedding_isotropy(df).collect()[0]
    assert r.mean_norm == 5.0 and r.avg_norm == 5.0
    assert r.isotropy == 0.0


def test_isotropy_mixed(spark):
    rows = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    r = embedding_isotropy(df).collect()[0]
    # mean vec (.5, .5): norm sqrt(.5); avg norm 1
    assert abs(r.mean_norm - round(math.sqrt(0.5), 6)) < 1e-9
    assert abs(r.isotropy - round(1 - math.sqrt(0.5), 6)) < 1e-9


def test_dow_hour_heatmap(spark):
    rows = [
        (1, dt.datetime(2024, 1, 7, 9, 5), 1, "view", None),   # Sun 9h
        (2, dt.datetime(2024, 1, 7, 9, 45), 1, "view", None),  # Sun 9h
        (3, dt.datetime(2024, 1, 8, 23, 0), 1, "view", None),  # Mon 23h
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    got = {(r.dow, r.hour): r for r in dow_hour_heatmap(df).collect()}
    assert got[(1, 9)].n == 2                      # Sunday = 1
    assert abs(got[(1, 9)].share - round(2 / 3, 6)) < 1e-9
    assert got[(2, 23)].n == 1
