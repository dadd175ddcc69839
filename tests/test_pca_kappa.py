"""pca_top_component and cohens_kappa — hand-computed cases."""

import numpy as np

from pdf_extractor_spark.operators.classify import cohens_kappa
from pdf_extractor_spark.operators.similarity import pca_top_component


def test_pca_matches_numpy_power_iteration(spark):
    rng = [
        [1.0, 0.1, 0.0],
        [2.0, 0.2, 0.1],
        [3.0, 0.1, 0.0],
        [4.0, 0.3, 0.2],
    ]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(rng)],
        "vec_id long, embedding array<float>",
    )
    got = {r.dim: r for r in pca_top_component(df, iters=3).collect()}

    X = np.array(rng, dtype=np.float32).astype(np.float64)
    v = np.ones(3)
    for _ in range(3):
        w = X.T @ (X @ v)
        v = w / np.sqrt((w * w).sum())
    lam = float(((X @ v) ** 2).sum())
    for d in range(3):
        assert abs(got[d].loading - round(v[d], 6)) < 1e-6
        assert abs(got[d].eigenvalue - round(lam, 6)) < 1e-4
    # dominant direction ~ first axis
    assert got[0].loading > 0.99


def test_pca_skips_null_vectors(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, None), (2, [2.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    got = {r.dim: r for r in pca_top_component(df, iters=2).collect()}
    assert got[0].loading == 1.0 and got[1].loading == 0.0


def _flags(spark, flags, name):
    return spark.createDataFrame(
        [(i, bool(f)) for i, f in enumerate(flags)],
        "doc_id long, accept boolean",
    )


def test_cohens_kappa_perfect_agreement(spark):
    a = _flags(spark, [1, 0, 1, 0], "a")
    b = _flags(spark, [1, 0, 1, 0], "b")
    r = cohens_kappa(a, b).collect()[0]
    assert (r.n, r.observed_agree, r.kappa) == (4, 1.0, 1.0)


def test_cohens_kappa_chance_only(spark):
    # independent 50/50 labelers agreeing exactly at chance: kappa 0
    a = _flags(spark, [1, 1, 0, 0], "a")
    b = _flags(spark, [1, 0, 1, 0], "b")
    r = cohens_kappa(a, b).collect()[0]
    assert r.observed_agree == 0.5 and r.expected_agree == 0.5
    assert r.kappa == 0.0


def test_cohens_kappa_constant_labeler(spark):
    # one labeler accepts everything -> pe can hit 1 when the other does
    # too; convention: kappa 0, no division blowup
    a = _flags(spark, [1, 1, 1], "a")
    b = _flags(spark, [1, 1, 1], "b")
    r = cohens_kappa(a, b).collect()[0]
    assert r.kappa == 0.0 and r.expected_agree == 1.0


def test_cohens_kappa_textbook(spark):
    # classic 2x2: a_true=30/50? use: n=100, both true 45, both false 35,
    # a-only 5, b-only 15 -> po=.8; a_true=50, b_true=60
    flags_a, flags_b = [], []
    flags_a += [1] * 45 + [1] * 5 + [0] * 15 + [0] * 35
    flags_b += [1] * 45 + [0] * 5 + [1] * 15 + [0] * 35
    a = _flags(spark, flags_a, "a")
    b = _flags(spark, flags_b, "b")
    r = cohens_kappa(a, b).collect()[0]
    pe = (50 * 60 + 50 * 40) / (100 * 100)
    kappa = (0.8 - pe) / (1 - pe)
    assert r.observed_agree == 0.8
    assert abs(r.expected_agree - round(pe, 6)) < 1e-9
    assert abs(r.kappa - round(kappa, 6)) < 1e-9
