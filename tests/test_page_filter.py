"""Page-range predicate (reference extractor.py:46-51): 'all'/int/'a,b'
parsing, silent out-of-range drop, and media-span page attachment."""

import pytest

from pdf_extractor_spark.operators.spans import filter_spans_by_page, parse_pages


def test_parse_pages():
    assert parse_pages("all") is None
    assert parse_pages(None) is None
    assert parse_pages(2) == [2]
    assert parse_pages("1,3") == [1, 3]
    assert parse_pages("0") == [0]
    with pytest.raises(TypeError):
        parse_pages(1.5)


@pytest.fixture(scope="module")
def span_doc(spark):
    # offsets shuffled on purpose: the operator must offset-sort first.
    # layout (by offset): media m-1 | text p0 | media m0 | text p1 | text p2
    rows = [
        (
            "d1",
            [
                ("text", "page one", None, 3),
                ("image", None, "m-1", 0),
                ("text", "page zero", None, 1),
                ("image", None, "m0", 2),
                ("text", "page two", None, 4),
            ],
        )
    ]
    return spark.createDataFrame(
        rows,
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )


def _kinds(df):
    [row] = df.collect()
    return [(s.kind, s.text or s.media_ref) for s in row.spans]


def test_all_passes_everything(span_doc):
    out = filter_spans_by_page(span_doc, "all")
    assert out.collect()[0].spans == span_doc.collect()[0].spans


def test_single_int_page(span_doc):
    # page 0 = first text span AND the media span following it; the
    # media span BEFORE any text (page -1) never matches a real page
    assert _kinds(filter_spans_by_page(span_doc, 0)) == [
        ("text", "page zero"),
        ("image", "m0"),
    ]


def test_comma_string_pages(span_doc):
    assert _kinds(filter_spans_by_page(span_doc, "1,2")) == [
        ("text", "page one"),
        ("text", "page two"),
    ]


def test_out_of_range_silently_dropped(span_doc):
    # reference extractor.py:62 `if page_num < num_pages` — no error
    assert _kinds(filter_spans_by_page(span_doc, "1,99")) == [
        ("text", "page one"),
    ]
    assert _kinds(filter_spans_by_page(span_doc, 99)) == []
