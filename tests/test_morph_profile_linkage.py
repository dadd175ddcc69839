"""morph_split, numeric_profile, linkage_scores — hand-computed cases."""

import math

from pdf_extractor_spark.operators.analytics import numeric_profile
from pdf_extractor_spark.operators.fuzzy import linkage_scores
from pdf_extractor_spark.operators.textstats import morph_split


def test_morph_split(spark):
    # 'motorboat' splits into motor|boat (both frequent); 'sail' has no
    # valid split pieces; 'boat' is below min_len
    text = " ".join(
        ["motorboat"] * 5 + ["motor"] * 6 + ["boat"] * 7 + ["sail"] * 5
    )
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = {r.word: r for r in morph_split(df, min_freq=5, min_len=4).collect()}
    assert set(got) == {"motorboat"}
    r = got["motorboat"]
    assert (r.left, r.right, r.freq) == ("motor", "boat", 5)
    assert abs(r.score - round(math.log(6) + math.log(7), 4)) < 1e-9


def test_morph_split_leftmost_tie(spark):
    # 'aaaa' can split a|aaa? pieces must be words: 'aa' freq ok ->
    # splits aa|aa (i=2) and a|aaa / aaa|a need 'a','aaa' in vocab.
    text = " ".join(["aaaa"] * 5 + ["aa"] * 5)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = morph_split(df, min_freq=5, min_len=4).collect()
    assert len(got) == 1
    assert (got[0].left, got[0].right) == ("aa", "aa")


def test_numeric_profile(spark):
    rows = [
        (1.0, 10.0, 0.05, 0.01),
        (2.0, 20.0, 0.05, 0.02),
        (3.0, 30.0, 0.10, None),
    ]
    df = spark.createDataFrame(
        rows,
        "l_quantity double, l_extendedprice double, l_discount double, l_tax double",
    )
    got = {r.column: r for r in numeric_profile(df).collect()}
    q = got["l_quantity"]
    assert (q.n, q.n_null, q.ndv) == (3, 0, 3)
    assert (q.min_v, q.max_v, q.mean) == (1.0, 3.0, 2.0)
    assert q.std == 1.0  # sample stddev of 1,2,3
    d = got["l_discount"]
    assert d.ndv == 2
    t = got["l_tax"]
    assert t.n_null == 1 and t.ndv == 2


def test_linkage_scores(spark):
    rows = [
        (1, "small ring"),
        (2, "smal ring"),    # dist 1, phonetic SMLL vs SML -> not equal
        (3, "hot gear"),
        (4, "hoot gear"),    # dist 1, phonetic HT == HT -> equal
    ]
    df = spark.createDataFrame(rows, "p_partkey long, p_name string")
    got = {(r.name_a, r.name_b): r for r in linkage_scores(
        df, "p_name", "p_partkey"
    ).collect()}
    r1 = got[("smal ring", "small ring")]
    # 2.5 (dist 1) - 0.5 (phonetic differs) + 0.5 = 2.5 -> below 3.0
    assert r1.phonetic_eq is False and r1.score == 2.5
    assert r1.is_match is False
    r2 = got[("hoot gear", "hot gear")]
    # 2.5 + 1.5 + 0.5 = 4.5 -> match
    assert r2.phonetic_eq is True and r2.score == 4.5
    assert r2.is_match is True
