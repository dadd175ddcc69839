"""dup_rate_by_source and corr_matrix — hand-computed cases."""

from pdf_extractor_spark.operators.analytics import corr_matrix
from pdf_extractor_spark.operators.curation import dup_rate_by_source


def test_dup_rate_by_source(spark):
    rows = [
        (1, "same text", "s1"),
        (2, "same text", "s1"),
        (3, "Same Text", "s1"),   # case-folds to the same digest
        (4, "other", "s1"),
        (5, "x", "s2"),
        (6, None, "s2"),
        (7, None, "s2"),          # null dedups with null
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r.source: r for r in dup_rate_by_source(df).collect()}
    s1 = got["s1"]
    assert (s1.n_docs, s1.n_unique) == (4, 2)
    assert s1.dup_rate == 0.5
    s2 = got["s2"]
    assert (s2.n_docs, s2.n_unique) == (3, 2)


def test_corr_matrix(spark):
    rows = [
        (1.0, 2.0, 0.1, -1.0),
        (2.0, 4.0, 0.2, -2.0),
        (3.0, 6.0, 0.3, -3.0),
        (4.0, 8.0, 0.1, -4.0),
    ]
    df = spark.createDataFrame(
        rows,
        "l_quantity double, l_extendedprice double, l_discount double, l_tax double",
    )
    got = {(r.col_a, r.col_b): r for r in corr_matrix(df).collect()}
    assert len(got) == 6
    # perfectly linear pairs
    assert got[("l_quantity", "l_extendedprice")].pearson == 1.0
    assert got[("l_quantity", "l_tax")].pearson == -1.0
    r = got[("l_quantity", "l_discount")]
    assert r.n == 4 and -1.0 < r.pearson < 1.0
