"""span_diff: the span-sequence-equality invariant as a distributed diff
operator — hand-built runs covering equal docs, text divergence, length
mismatch, null-field canonicalization, and one-side-missing docs."""

from pdf_extractor_spark.operators.spans import span_diff

SCHEMA = (
    "doc_id string, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)


def _diff(spark, a_rows, b_rows):
    a = spark.createDataFrame(a_rows, SCHEMA)
    b = spark.createDataFrame(b_rows, SCHEMA)
    return {
        r.doc_id: (r.in_a, r.in_b, r.n_a, r.n_b, r.equal, r.first_diff)
        for r in span_diff(a, b).collect()
    }


def _t(text, off):
    return ("text", text, None, off)


def _m(ref, off):
    return ("image", None, ref, off)


def test_equal_and_diverging_runs(spark):
    a = [
        ("d1", [_t("hello", 0), _m("img1", 1)]),
        ("d2", [_t("alpha", 0), _t("beta", 1)]),
        ("d3", [_t("x", 0)]),
    ]
    b = [
        ("d1", [_t("hello", 0), _m("img1", 1)]),      # identical
        ("d2", [_t("alpha", 0), _t("BETA", 1)]),       # text diff at 2
        ("d3", [_t("x", 0), _m("extra", 1)]),          # B longer: diff at 2
    ]
    got = _diff(spark, a, b)
    assert got["d1"] == (True, True, 2, 2, True, None)
    assert got["d2"] == (True, True, 2, 2, False, 2)
    assert got["d3"] == (True, True, 1, 2, False, 2)


def test_offset_changes_are_not_divergence(spark):
    # order is the array position; the offset FIELD is bookkeeping
    got = _diff(
        spark,
        [("d1", [_t("a", 0), _t("b", 5)])],
        [("d1", [_t("a", 3), _t("b", 9)])],
    )
    assert got["d1"][4] is True


def test_kind_flip_with_same_nulls_diverges(spark):
    # canonicalization must not collapse (kind=text, text=NULL) with
    # (kind=image, media_ref=NULL)
    got = _diff(
        spark,
        [("d1", [("text", None, None, 0)])],
        [("d1", [("image", None, None, 0)])],
    )
    assert got["d1"] == (True, True, 1, 1, False, 1)


def test_one_side_missing_doc(spark):
    got = _diff(
        spark,
        [("only_a", [_t("x", 0)])],
        [("only_b", [_t("y", 0)])],
    )
    assert got["only_a"] == (True, False, 1, 0, False, 1)
    assert got["only_b"] == (False, True, 0, 1, False, 1)


def test_both_empty_spans_equal(spark):
    got = _diff(spark, [("d1", [])], [("d1", [])])
    assert got["d1"] == (True, True, 0, 0, True, None)
