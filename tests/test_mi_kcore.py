"""mutual_information and kcore_peel — hand-computed cases."""

import math

from pdf_extractor_spark.operators.analytics import mutual_information
from pdf_extractor_spark.operators.graph import kcore_peel


def test_mutual_information_perfect_dependence(spark):
    rows = [(1, "en", "s1"), (2, "en", "s1"), (3, "fr", "s2"), (4, "fr", "s2")]
    df = spark.createDataFrame(rows, "doc_id long, lang string, source string")
    r = mutual_information(df, "lang", "source").collect()[0]
    # x fully determines y: MI = H(x) = H(y) = ln 2, NMI = 1
    assert r.n == 4
    assert abs(r.h_x - round(math.log(2), 6)) < 1e-9
    assert abs(r.mi - round(math.log(2), 6)) < 1e-9
    assert r.nmi == 1.0


def test_mutual_information_independent(spark):
    # balanced independent 2x2: every cell 1/4 -> MI 0
    rows = [
        (1, "en", "s1"), (2, "en", "s2"), (3, "fr", "s1"), (4, "fr", "s2"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, source string")
    r = mutual_information(df, "lang", "source").collect()[0]
    assert r.mi == 0.0 and r.nmi == 0.0
    assert abs(r.h_x - round(math.log(2), 6)) < 1e-9


def test_mutual_information_constant_column(spark):
    rows = [(1, "en", "s1"), (2, "en", "s2")]
    df = spark.createDataFrame(rows, "doc_id long, lang string, source string")
    r = mutual_information(df, "lang", "source").collect()[0]
    # H(x)=0 -> degenerate NMI guarded to 0
    assert r.h_x == 0.0 and r.mi == 0.0 and r.nmi == 0.0


def _e(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_kcore_peel_separates_core_from_chain(spark):
    # K4 core (every node degree 3) + a pendant chain x-y hanging off a
    core = [
        ("a", "b"), ("a", "c"), ("a", "d"),
        ("b", "c"), ("b", "d"), ("c", "d"),
    ]
    chain = [("a", "x"), ("x", "y")]
    got = {r.node: r for r in kcore_peel(_e(spark, core + chain), k=3, rounds=2).collect()}
    # y: degree 1 -> peeled round 1; x: degree 2 then 1 -> peeled round 2
    assert got["y"].in_core is False and got["y"].degree_final == 0
    assert got["x"].in_core is False
    # the K4 survives both rounds at degree 3 (a loses its pendant edge)
    for n in ("a", "b", "c", "d"):
        assert got[n].in_core is True
        assert got[n].degree_final == 3
    assert got["a"].degree0 == 4  # pendant edge counts before peeling


def test_kcore_degrees_directed_multiplicity(spark):
    # mutual pair counts both directions in the distinct directed set
    got = {r.node: r for r in kcore_peel(
        _e(spark, [("u", "v"), ("v", "u")]), k=2, rounds=1
    ).collect()}
    assert got["u"].degree0 == 2 and got["u"].in_core is True
