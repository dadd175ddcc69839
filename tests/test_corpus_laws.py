"""Hand-computed expectations for the corpus-law operators (zipf_fit,
heaps_law, word_burstiness) — the DuckDB oracle checks cross-engine
parity; these pin the intended semantics against literal arithmetic."""

import math

import pytest

from pdf_extractor_spark.operators.textstats import (
    heaps_law,
    word_burstiness,
    zipf_fit,
)


def _ols(xs, ys):
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return slope, (sy - slope * sx) / n


def test_zipf_fit_literal(spark):
    # freqs: a=4, b=2, c=1 -> ranks 1,2,3 (desc freq, term tiebreak)
    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "A b c a"), (3, ""), (4, None)],
        ["doc_id", "text"],
    )
    row = zipf_fit(docs).collect()[0]
    assert (row.n_types, row.n_tokens) == (3, 7)
    slope, intercept = _ols(
        [math.log(r) for r in (1, 2, 3)],
        [math.log(f) for f in (4, 2, 1)],
    )
    assert row.zipf_slope == round(slope, 6)
    assert row.zipf_intercept == round(intercept, 6)


def test_zipf_fit_tiebreak_by_term(spark):
    # equal freqs: ranks assigned in term order -> deterministic fit
    docs = spark.createDataFrame([(1, "b a c")], ["doc_id", "text"])
    row = zipf_fit(docs).collect()[0]
    # all freq=1 -> ys all 0 -> slope 0, intercept 0
    assert (row.zipf_slope, row.zipf_intercept) == (0.0, 0.0)
    assert (row.n_types, row.n_tokens) == (3, 3)


def test_heaps_law_checkpoints(spark):
    # 4 docs, 2 buckets (ids 0..3 -> bucket floor((id)*2/4): 0,0,1,1)
    docs = spark.createDataFrame(
        [(0, "a b"), (1, "a c"), (2, "c d e"), (3, None)],
        ["doc_id", "text"],
    )
    out = {r.bucket: r for r in heaps_law(docs, n_buckets=2).collect()}
    assert set(out) == {0, 1}
    # bucket 0: 4 tokens, new types {a,b,c}; bucket 1: 3 tokens, {d,e}
    assert (out[0].cum_tokens, out[0].cum_vocab) == (4, 3)
    assert (out[1].cum_tokens, out[1].cum_vocab) == (7, 5)
    beta, lnk = _ols(
        [math.log(4), math.log(7)], [math.log(3), math.log(5)]
    )
    assert out[0].heaps_beta == round(beta, 6)
    assert out[0].heaps_k == round(math.exp(lnk), 6)
    # fit constants identical on every checkpoint row
    assert out[1].heaps_beta == out[0].heaps_beta


def test_heaps_law_monotone_at_sf(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = sorted(heaps_law(docs).collect(), key=lambda r: r.bucket)
    toks = [r.cum_tokens for r in rows]
    vocab = [r.cum_vocab for r in rows]
    assert toks == sorted(toks) and vocab == sorted(vocab)
    # sub-linear growth: beta in [0, 1) — the synthetic corpus has a
    # FIXED vocabulary (all types appear in bucket 0), so beta is
    # exactly 0 there; natural text lands strictly inside
    assert 0.0 <= rows[0].heaps_beta < 1.0
    assert rows[-1].cum_vocab == rows[0].heaps_k or rows[0].heaps_beta > 0


def test_word_burstiness_literal(spark):
    docs = spark.createDataFrame(
        [
            (1, "x x y"),
            (2, "x y"),
            (3, "x x x"),
            (4, "y"),
            (5, "x"),
            (6, "y y"),
        ],
        ["doc_id", "text"],
    )
    out = {r.term: r for r in word_burstiness(docs, min_df=4).collect()}
    # x: df1=4 (docs 1,2,3,5), df2=2 (1,3), tf total 7
    assert (out["x"].df1, out["x"].df2, out["x"].total_tf) == (4, 2, 7)
    assert out["x"].burstiness == 0.5
    assert out["x"].mean_tf == 1.75
    # y: df1=4, df2=1, total 5
    assert (out["y"].df1, out["y"].df2, out["y"].total_tf) == (4, 1, 5)
    assert out["y"].burstiness == 0.25


def test_word_burstiness_min_df_prunes(spark):
    docs = spark.createDataFrame(
        [(1, "rare common"), (2, "common")], ["doc_id", "text"]
    )
    terms = {r.term for r in word_burstiness(docs, min_df=2).collect()}
    assert terms == {"common"}
