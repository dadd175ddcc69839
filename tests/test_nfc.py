"""nfc_normalize: composition semantics vs stdlib unicodedata, null
passthrough, and the plan pin — exactly ONE ArrowEvalPython stage (the
UDF result is bound once; changed/length columns read the bound attr)."""

import unicodedata

from pdf_extractor_spark.operators.textstats import nfc_normalize

CASES = [
    (1, "cafe\u0301"),                       # e + combining acute -> \u00e9
    (2, "caf\u00e9"),                        # already composed -> unchanged
    (3, "A\u030angstro\u0308m"),            # A+ring, o+diaeresis decomposed
    (4, None),                               # null passthrough
    (5, ""),                                 # empty unchanged
    (6, "\u2460 \ufb01"),                   # NFC keeps these (NFKC would not)
]


def test_matches_unicodedata(spark):
    df = spark.createDataFrame(CASES, "doc_id long, text string")
    out = {r.doc_id: r for r in nfc_normalize(df).collect()}
    for doc_id, text in CASES:
        r = out[doc_id]
        if text is None:
            assert r.text_nfc is None and not r.changed
            continue
        expected = unicodedata.normalize("NFC", text)
        assert r.text_nfc == expected
        assert r.changed == (text != expected)
        assert r.len_raw == len(text) and r.len_nfc == len(expected)
    # composition actually shortened the decomposed cases
    assert out[1].len_nfc == out[1].len_raw - 1
    assert not out[2].changed and not out[6].changed


def test_single_arrow_python_stage(spark):
    df = spark.createDataFrame(CASES, "doc_id long, text string")
    plan = (
        nfc_normalize(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("ArrowEvalPython") == 1
    assert "BatchEvalPython" not in plan  # never the per-row evaluator
