"""Hand-computed parity for the page-cleanup layout operators:
dehyphenate (end-of-line hyphenation repair) and header_footer_strip
(frequency-based running header/footer removal)."""

import hashlib

from pyspark.sql import functions as F


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


# ---- synthesize_hyphen_wraps + dehyphenate ----

def test_hyphen_wrap_positions_and_repair(spark):
    from pdf_extractor_spark.operators.layout import (
        dehyphenate,
        synthesize_hyphen_wraps,
    )

    # doc 4: token position i (1-based) wraps iff (4 + i) % 5 == 0 and
    # len >= 4 -> position 1 ("table" -> "ta-\nble"); doc 2: eligible
    # position 3 holds "key" (len 3) -> too short, untouched
    df = spark.createDataFrame(
        [(4, "table scan key merge row"), (2, "a bb key cccc")],
        "doc_id long, text string",
    )
    wrapped = {r.doc_id: r.wrapped for r in synthesize_hyphen_wraps(df).collect()}
    assert wrapped[4] == "ta-\nble scan key merge row"
    assert wrapped[2] == "a bb key cccc"  # pos 3 too short; pos 8 absent

    out = {r.doc_id: r for r in dehyphenate(synthesize_hyphen_wraps(df)).collect()}
    assert out[4].n_wraps == 1 and out[4].dehyphenated == "table scan key merge row"
    assert out[2].n_wraps == 0 and out[2].dehyphenated == "a bb key cccc"


def test_dehyphenate_null_text(spark):
    from pdf_extractor_spark.operators.layout import dehyphenate

    df = spark.createDataFrame([(1, None)], "doc_id long, wrapped string")
    r = dehyphenate(df).collect()[0]
    assert r.n_wraps == 0 and r.dehyphenated == ""


# ---- synthesize_doc_pages ----

def test_synthesize_doc_pages_shape(spark):
    from pdf_extractor_spark.operators.layout import synthesize_doc_pages

    # doc 1 -> 2 pages, 4 tokens -> per_page 2
    df = spark.createDataFrame([(1, "aa bb cc dd")], "doc_id long, text string")
    pages = {r.page_no: r.page for r in synthesize_doc_pages(df).collect()}
    assert pages[1] == "Report doc 1\naa bb\nPage 1 of 2"
    assert pages[2] == "Report doc 1\ncc dd\nPage 2 of 2"


# ---- header_footer_strip ----

def test_header_footer_strip_hand_computed(spark):
    from pdf_extractor_spark.operators.layout import header_footer_strip

    # doc 1, 3 pages: header on all 3 (stripped), numbered footer
    # normalizes identically on all 3 (stripped), 'repeated body' on only
    # 2 of 3 pages (threshold = max(2, ceil(0.8*3)) = 3 -> KEPT)
    rows = [
        (1, 1, "HEAD\nalpha\nrepeated body\nPage 1 of 3"),
        (1, 2, "HEAD\nbeta\nrepeated body\nPage 2 of 3"),
        (1, 3, "HEAD\ngamma\nPage 3 of 3"),
        # doc 2: single page -> floor of 2 means nothing strips
        (2, 1, "HEAD\nonly body\nPage 1 of 1"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, page_no int, page string")
    got = {r.doc_id: r for r in header_footer_strip(df).collect()}

    d1 = got[1]
    assert (d1.n_pages, d1.n_lines, d1.n_boiler_lines) == (3, 11, 6)
    assert d1.body_md5 == _md5(
        "alpha\nrepeated body\nbeta\nrepeated body\ngamma"
    )
    d2 = got[2]
    assert (d2.n_pages, d2.n_lines, d2.n_boiler_lines) == (1, 3, 0)
    assert d2.body_md5 == _md5("HEAD\nonly body\nPage 1 of 1")


def test_header_footer_strip_all_boiler_page(spark):
    from pdf_extractor_spark.operators.layout import header_footer_strip

    # every line repeats on both pages -> everything strips, body empty
    rows = [(1, 1, "X\nY"), (1, 2, "X\nY")]
    df = spark.createDataFrame(rows, "doc_id long, page_no int, page string")
    r = header_footer_strip(df).collect()[0]
    assert (r.n_lines, r.n_boiler_lines) == (4, 4)
    assert r.body_md5 == _md5("")


# ---- quality_percentile: distribution-table percent_rank ----

def test_quality_percentile_hand_computed(spark):
    from pdf_extractor_spark.operators.textstats import quality_percentile

    rows = [
        # en: scores 0.1, 0.2, 0.2, 0.4 -> pct = lower/(n-1) over n=4
        (1, "en", 0.1),
        (2, "en", 0.2),
        (3, "en", 0.2),
        (4, "en", 0.4),
        # fr: singleton -> 0.0
        (5, "fr", 0.9),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, quality double")
    got = {r.doc_id: r.pct_rank for r in quality_percentile(df).collect()}
    assert got == {
        1: 0.0,
        2: round(1 / 3, 6),  # one strictly lower; tie shares the rank
        3: round(1 / 3, 6),
        4: 1.0,
        5: 0.0,
    }


# ---- section_split: heading-based segmentation ----

def test_section_split_hand_computed(spark):
    from pdf_extractor_spark.operators.layout import section_split

    doc = "\n".join(
        [
            "intro line one",          # unheaded -> section 0
            "HEADING 1 1",
            "body a b",
            "body c",
            "HEADING 2 1",
            "",                        # empty body line: counts, 0 tokens
            "THIS HEADING HAS FIVE WORDS",  # >4 words -> NOT a heading
        ]
    )
    df = spark.createDataFrame([(1, doc)], "doc_id long, doc string")
    got = {
        r.section_idx: (r.heading, r.n_lines, r.n_tokens)
        for r in section_split(df).collect()
    }
    assert got == {
        0: (None, 1, 3),
        1: ("HEADING 1 1", 2, 5),
        2: ("HEADING 2 1", 2, 5),  # empty line + the 5-word caps line
    }


def test_section_split_synthesized_roundtrip(spark):
    from pdf_extractor_spark.operators.layout import (
        section_split,
        synthesize_sections,
    )

    # doc 7: 1 + 7 % 3 = 2 sections of 6 tokens (one 6-token line each),
    # plus the doc_id % 7 == 0 unheaded preamble
    df = spark.createDataFrame(
        [(7, " ".join(f"t{i}" for i in range(12)))],
        "doc_id long, text string",
    )
    got = {
        r.section_idx: (r.heading, r.n_lines, r.n_tokens)
        for r in section_split(synthesize_sections(df)).collect()
    }
    assert got == {
        0: (None, 1, 3),              # 'unheaded preamble text'
        1: ("HEADING 1 1", 1, 6),
        2: ("HEADING 2 1", 1, 6),
    }
