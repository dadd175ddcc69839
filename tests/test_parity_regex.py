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


def test_arrow_prefilter_superset_bmp():
    """The Arrow ignore_case containment prefilter
    (oracle.classifier.keyword_presence_batch) must never miss a
    character Python re's IGNORECASE literal matching would accept —
    a false negative there silently drops a keyword from classification.
    Both engines decompose literal matching per character (simple case
    folding, no multi-char expansions — probed both ways), so the
    whole-keyword superset property reduces to this exhaustive per-char
    check: for every BMP codepoint c and every distinct character k of
    the configured keywords, re-match(k, c) implies arrow-contains(k, c).
    """
    import re

    import pyarrow as pa
    import pyarrow.compute as pc

    from pdf_extractor_spark.config import load_patterns

    from pdf_extractor_spark.oracle.classifier import _arrow_missed_chars

    kw_chars = sorted(
        {ch for p in load_patterns().values() for kw in p.keywords
         for ch in kw}
    )
    assert kw_chars
    cps = [chr(c) for c in range(0x20, 0x10000)
           if not (0xD800 <= c <= 0xDFFF)]
    arr = pa.array(cps, type=pa.string())
    any_divergence = False
    for k in kw_chars:
        pat = re.compile(re.escape(k), re.IGNORECASE)
        arrow = pc.match_substring(arr, k, ignore_case=True).to_numpy(
            zero_copy_only=False
        )
        missed = [
            c for c, a in zip(cps, arrow)
            if pat.fullmatch(c) and not a
        ]
        # every divergence must be EXACTLY what the runtime danger-set
        # computation reports (the batch path falls back to the full
        # exact scan for rows containing these)
        assert tuple(missed) == _arrow_missed_chars(k), (k, missed[:5])
        any_divergence = any_divergence or bool(missed)
    # the config's keywords contain i/I, whose fold class diverges
    # (İ/ı) — if this stops holding the danger machinery is untested
    assert any_divergence


def test_keyword_presence_batch_matches_scalar():
    """Batch (Arrow-prefiltered) presence == per-row exact presence on
    adversarial inputs: overlapping keywords, case zoo, None/empty."""
    from pdf_extractor_spark.oracle.classifier import (
        _keyword_presence,
        keyword_presence_batch,
    )

    kws = ("DANFE", "Nota Fiscal Eletrônica", "CNPJ", "Valor Total",
           "RECIBO", "Pagamento")
    texts = [
        "danfe emitida com nota fiscal eletrônica e cnpj valido",
        "NOTA FISCAL ELETRÔNICA — VALOR TOTAL R$ 10,00",
        "recibo de PAGAMENTO",
        "xDANFEx no boundary here",          # \b must reject
        "danfe. CNPJ: 1",                    # punctuation boundaries
        "", None, "nothing relevant at all",
        "ς vs Σ danfe ΣΊΣΥΦΟΣ",
        # fold-divergent danger chars: CPython re matches these as i/I
        # but Arrow containment does not — the batch path must detect
        # the row and fall back to the full exact scan
        "nota fıscal eletrônıca com cnpj",       # dotless ı inside words
        "NOTA FİSCAL ELETRÔNİCA",                 # dotted İ
        "recıbo de pagamento e DANFE",
    ]
    got = keyword_presence_batch(texts, kws)
    want = [
        _keyword_presence(t, kws) if isinstance(t, str) and t
        else frozenset()
        for t in texts
    ]
    assert got == want
