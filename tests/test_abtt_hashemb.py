"""abtt_transform and hashed_doc_embedding — hand-computed cases."""

import hashlib

from pdf_extractor_spark.operators.similarity import abtt_transform
from pdf_extractor_spark.operators.textstats import hashed_doc_embedding


def test_abtt_removes_common_direction(spark):
    # all vectors share direction e0 plus small e1 noise; after ABTT the
    # e0 component must be (near) zero for every vector
    rows = [
        (0, [5.0, 0.1]),
        (1, [4.0, -0.2]),
        (2, [6.0, 0.05]),
        (3, [5.5, -0.1]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {(r.vec_id, r.dim): r.value for r in abtt_transform(df).collect()}
    assert len(got) == 8
    # dominant direction ~ e0 -> corrected dim-0 coordinates collapse
    for v in range(4):
        assert abs(got[(v, 0)]) < 0.05
    # the orthogonal noise survives mostly intact
    assert abs(got[(0, 1)] - 0.1) < 0.05


def test_abtt_preserves_orthogonal_vector(spark):
    rows = [(0, [1.0, 0.0]), (1, [1.0, 0.0]), (2, [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {(r.vec_id, r.dim): r.value for r in abtt_transform(df).collect()}
    # the dominant direction is close to e0 (two mass-carrying vectors);
    # vec 2 is nearly orthogonal and keeps most of its e1 coordinate
    assert got[(2, 1)] > 0.8


def _h60(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_hashed_doc_embedding(spark):
    rows = [(1, "alpha alpha beta"), (2, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.doc_id, r.dim): r for r in hashed_doc_embedding(df, dim=16).collect()}
    ha, hb = _h60("alpha"), _h60("beta")
    sa = -1 if ha % 128 >= 64 else 1
    sb = -1 if hb % 128 >= 64 else 1
    da, db = ha % 16, hb % 16
    expected = {}
    expected[da] = expected.get(da, 0) + 2 * sa
    expected[db] = expected.get(db, 0) + sb
    assert {k[1] for k in got} == set(expected)
    norm = sum(v * v for v in expected.values()) ** 0.5
    for d, wt in expected.items():
        r = got[(1, d)]
        assert r.weight == wt
        assert abs(r.unit - round(wt / norm, 6)) < 1e-9
    # null-text doc emits no rows
    assert all(k[0] == 1 for k in got)
