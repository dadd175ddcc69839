"""regional_top_parts, null_profile, benford_deviation — hand-computed
cases."""

import math

from pdf_extractor_spark.operators.analytics import (
    benford_deviation,
    null_profile,
    regional_top_parts,
)


def test_regional_top_parts(spark):
    region = spark.createDataFrame(
        [(1, "EUROPE"), (2, "ASIA")], "r_regionkey long, r_name string"
    )
    nation = spark.createDataFrame(
        [(10, 1), (20, 2)], "n_nationkey long, n_regionkey long"
    )
    customer = spark.createDataFrame(
        [(100, 10), (200, 20)], "c_custkey long, c_nationkey long"
    )
    orders = spark.createDataFrame(
        [(1000, 100), (2000, 200)], "o_orderkey long, o_custkey long"
    )
    li = spark.createDataFrame(
        [
            (1000, 7, 100.0, 0.0),
            (1000, 8, 50.0, 0.0),
            (1000, 7, 10.0, 0.5),   # part 7 total 105
            (2000, 9, 80.0, 0.25),  # ASIA part 9 -> 60
        ],
        "l_orderkey long, l_partkey long, l_extendedprice double, l_discount double",
    )
    got = {(r.region, r.rank): r for r in regional_top_parts(
        li, orders, customer, nation, region, top_k=3
    ).collect()}
    assert got[("EUROPE", 1)].part_key == 7
    assert got[("EUROPE", 1)].revenue == 105.0
    assert got[("EUROPE", 2)].part_key == 8
    assert got[("ASIA", 1)].revenue == 60.0
    assert ("ASIA", 2) not in got


def test_null_profile(spark):
    rows = [
        (1, "hello", "en", "s1"),
        (2, None, "  ", "s1"),
        (3, "", None, "s2"),
        (4, "x", "fr", None),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    got = {r.column: r for r in null_profile(df).collect()}
    assert set(got) == {"text", "lang", "source"}
    t = got["text"]
    assert (t.n_rows, t.n_null, t.n_blank) == (4, 1, 1)
    assert t.pct_missing == 0.5
    assert (got["lang"].n_null, got["lang"].n_blank) == (1, 1)
    assert (got["source"].n_null, got["source"].n_blank) == (1, 0)


def test_benford_deviation(spark):
    rows = [(i, v) for i, v in enumerate(
        [123.0, 19.5, 0.17, 2000.0, 999.0, 850.5]
    )]
    df = spark.createDataFrame(rows, "o_orderkey long, o_totalprice double")
    got = {r.digit: r for r in benford_deviation(df).collect()}
    # first significant digits: 1, 1, 1, 2, 9, 8
    assert got[1].n == 3 and got[2].n == 1 and got[9].n == 1 and got[8].n == 1
    assert abs(got[1].observed - 0.5) < 1e-9
    assert abs(got[1].expected - round(math.log10(2), 6)) < 1e-9
    exp1 = math.log10(2)
    chi1 = 6 * (0.5 - exp1) ** 2 / exp1
    assert abs(got[1].chi_contrib - round(chi1, 6)) < 1e-6
