"""HTML boilerplate strip / DOM heuristics (operators/html.py).

Covers: hand-computed block features on crafted pages, the keep rule's two
signals (length, link density), noise removal, the space-insensitive
round-trip guarantee on the synthesized corpus, and the zero-shuffle plan
(the scale property: main-content extraction is a narrow map at 10^12 docs).
"""

import pyspark.sql.functions as F
import pytest

from pdf_extractor_spark.operators.html import (
    html_blocks,
    html_main_content,
    synthesize_html,
)

PAGE = (
    "<html><head><title>t</title><style>p{color:red}</style>"
    "<script>var x = 1 < 2;</script></head><body>"
    "<!-- secret comment -->"
    '<nav><a href="/">home</a> <a href="/b">browse all topics</a></nav>'
    "<p>this paragraph is long enough to be kept as main content.</p>"
    "<p>short one</p>"
    '<p>a linky paragraph where <a href="/x">most of the visible text '
    "lives inside the anchor element itself</a> yes</p>"
    "<div>another sufficiently long content block with <b>inline</b> "
    "markup that survives stripping</div>"
    "</body></html>"
)


def _rows(spark, html):
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    return {r.block_idx: r for r in html_blocks(df).collect()}


def test_block_features_hand_computed(spark):
    rows = _rows(spark, PAGE)
    texts = [rows[i].txt for i in sorted(rows)]
    # noise removed: no style/script/comment text anywhere
    joined = " ".join(texts)
    assert "secret" not in joined and "color" not in joined
    assert "var x" not in joined
    # block 0: head remnant "t" (title is not a block tag)
    assert rows[0].txt == "t" and rows[0].keep is False
    nav = rows[1]
    assert nav.txt == "home browse all topics"
    assert nav.link_len == len("home") + len("browse all topics")
    assert nav.keep is False  # link-dense
    long_p = rows[2]
    assert long_p.txt == (
        "this paragraph is long enough to be kept as main content."
    )
    assert long_p.link_len == 0 and long_p.keep is True
    assert rows[3].txt == "short one" and rows[3].keep is False
    linky = rows[4]
    inner = "most of the visible text lives inside the anchor element itself"
    assert linky.link_len == len(inner)
    assert linky.text_len == len("a linky paragraph where " + inner + " yes")
    assert linky.keep is False  # long but link-dense
    div = rows[5]
    assert div.txt == (
        "another sufficiently long content block with inline markup "
        "that survives stripping"
    )
    assert div.keep is True


def test_main_content_assembly(spark):
    df = spark.createDataFrame([(1, PAGE)], "doc_id long, html string")
    row = html_main_content(df).collect()[0]
    assert row.main_text == (
        "this paragraph is long enough to be kept as main content.\n"
        "another sufficiently long content block with inline markup "
        "that survives stripping"
    )
    assert row.n_blocks == 6 and row.n_kept == 2
    assert row.total_len == sum(
        len(t)
        for t in [
            "t",
            "home browse all topics",
            "this paragraph is long enough to be kept as main content.",
            "short one",
            "a linky paragraph where most of the visible text lives inside "
            "the anchor element itself yes",
            "another sufficiently long content block with inline markup "
            "that survives stripping",
        ]
    )
    assert row.kept_len == 57 + 82
    assert 0.0 < row.boiler_ratio < 1.0


def test_whitespace_collapse_and_empty(spark):
    df = spark.createDataFrame(
        [
            (1, "<p>  spaced\t\tout\n\n   text that is long enough to "
                "pass the length gate  </p>"),
            (2, None),
            (3, ""),
        ],
        "doc_id long, html string",
    )
    out = {r.doc_id: r for r in html_main_content(df).collect()}
    assert out[1].main_text == (
        "spaced out text that is long enough to pass the length gate"
    )
    assert out[2].main_text == "" and out[2].n_blocks == 0
    assert out[3].main_text == "" and out[3].boiler_ratio == 0.0


def test_synthesized_roundtrip_space_insensitive(spark):
    """Main content recovered from the synthetic page equals the original
    document text up to whitespace (the midpoint cut may split a word)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    long_docs = docs.filter(F.length("text") >= 60)
    got = html_main_content(synthesize_html(long_docs)).select(
        "doc_id",
        F.regexp_replace(F.regexp_replace("main_text", "\n", ""), " ", "").alias(
            "recovered"
        ),
    )
    want = long_docs.select(
        "doc_id", F.regexp_replace(F.trim("text"), " ", "").alias("expected")
    )
    bad = got.join(want, "doc_id").filter(
        F.col("recovered") != F.col("expected")
    )
    assert long_docs.count() > 100
    assert bad.count() == 0


def test_boilerplate_fully_dropped_on_synthetic(spark):
    """Every synthetic boilerplate block (nav, aside, ads, share, footer,
    headings) is rejected; only the two article paragraphs survive."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = html_main_content(synthesize_html(docs)).collect()
    for r in rows:
        assert r.n_kept <= 2
        for marker in ("sponsored", "copyright", "archive", "related item",
                       "portal", "share like"):
            assert marker not in r.main_text


def test_main_content_plan_is_narrow(spark):
    """Scale pin: no Exchange (shuffle), no Python eval — a pure per-row
    projection chain that scales linearly with executors."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for df in (
        html_main_content(synthesize_html(docs)),
        html_blocks(synthesize_html(docs)),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "Python" not in plan


def test_corpus_has_no_html_metachars(spark):
    """synthesize_html documents its no-escaping assumption; pin it."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n = docs.filter(F.col("text").rlike("[<>&]")).count()
    assert n == 0


def test_extract_links_rows_and_cleaning(spark):
    from pdf_extractor_spark.operators.html import extract_links

    pages = spark.createDataFrame(
        [
            (1, '<html><a href="/a">one</a> text <A HREF="/b"> two\n<b>bold</b> </A></html>'),
            (2, "<html>no links</html>"),
        ],
        "doc_id long, html string",
    )
    rows = sorted(
        (r.doc_id, r.link_idx, r.href, r.anchor)
        for r in extract_links(pages).collect()
    )
    # case-insensitive match, inline tags stripped, whitespace collapsed,
    # doc 2 contributes nothing
    assert rows == [(1, 0, "/a", "one"), (1, 1, "/b", "two bold")]


def test_extract_links_plan_is_narrow(spark):
    from pdf_extractor_spark.operators.html import extract_links

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    df = extract_links(synthesize_html(docs))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan
    # the page-synthesis concat must not be re-inlined into a pre-generate
    # filter (InferFiltersFromGenerate); posexplode_outer keeps it out
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    assert opt.count("concat(") <= 2  # one per regexp_extract_all arm


def test_anchor_text_index_argmax_and_doc_counts(spark):
    from pdf_extractor_spark.operators.html import anchor_text_index

    links = spark.createDataFrame(
        [
            (1, 0, "/a", "zz"),
            (1, 1, "/a", "mm"),
            (2, 0, "/a", "mm"),
            (2, 1, "/a", "aa"),  # counts: mm=2, zz=1, aa=1
            (2, 2, "/b", "bb"),
        ],
        "doc_id long, link_idx int, href string, anchor string",
    )
    rows = {r.href: r for r in anchor_text_index(links).collect()}
    assert rows["/a"].n_links == 4 and rows["/a"].n_docs == 2
    assert rows["/a"].top_anchor == "mm"
    assert rows["/b"].n_links == 1 and rows["/b"].top_anchor == "bb"
    # count tie at 1-1 breaks lexicographically: single-doc href
    links2 = spark.createDataFrame(
        [(1, 0, "/t", "zebra"), (1, 1, "/t", "apple")],
        "doc_id long, link_idx int, href string, anchor string",
    )
    top = anchor_text_index(links2).collect()[0]
    assert top.top_anchor == "apple" and top.n_docs == 1
