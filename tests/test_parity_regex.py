"""Python-vs-Java regex parity for the normalization path (SURVEY.md §7.3-1).

PY_WS_CLASS must equal Python's str-whitespace set; the Spark columnar
preprocess must agree with the oracle on adversarial fixtures (unicode
whitespace, control chars, CJK, empties).
"""

import re

import pytest

from pdf_extractor_spark.operators.spans import PY_WS_CLASS
from pdf_extractor_spark.oracle.language import preprocess_for_language

_CLASS_RE = re.compile(PY_WS_CLASS)


def test_py_ws_class_matches_str_isspace_bmp():
    mismatches = []
    for cp in range(0x10000):
        ch = chr(cp)
        if bool(_CLASS_RE.fullmatch(ch)) != ch.isspace():
            mismatches.append(hex(cp))
    assert mismatches == []


def test_py_ws_chars_literal_set_matches_isspace_bmp():
    """The btrim/translate literal set must equal the regex class — the
    fast primitives and the regex path describe the same whitespace."""
    from pdf_extractor_spark.operators.spans import (
        CONTROL_CHARS,
        PY_WS_CHARS,
    )

    assert sorted(PY_WS_CHARS) == sorted(
        chr(c) for c in range(0x10000) if chr(c).isspace()
    )
    assert sorted(CONTROL_CHARS) == sorted(
        chr(c)
        for c in range(0x10000)
        if 0x00 <= c <= 0x1F or 0x7F <= c <= 0x9F
    )


ADVERSARIAL = [
    "  This   is  a   text   with   extra   spaces.  ",
    "这是  中文  文本",
    "Text with \x00 control \x1f characters",
    "",
    "\xa0leading nbsp and trailing\xa0",
    "\x1c\x1d file separators \x1e\x1f",
    "tab\tand\nnewline\r\nand\x0bvt\x0cff",
    "em space en space thin space",
    "ideographic　space",
    "nel\x85char",
    "del\x7fchar and c1 \x9f here",
    "   ",
    " line sep para sep",
    "ok plain text",
]


@pytest.mark.parametrize("lang", ["en", "zh"])
def test_spark_preprocess_equals_oracle(spark, lang):
    from pyspark.sql import functions as F

    from pdf_extractor_spark.operators.spans import preprocess_text

    df = spark.createDataFrame([(t,) for t in ADVERSARIAL], ["t"])
    got = [
        r.out
        for r in df.select(
            preprocess_text(F.col("t"), F.lit(lang)).alias("out")
        ).collect()
    ]
    expected = [preprocess_for_language(t, lang) for t in ADVERSARIAL]
    assert got == expected
