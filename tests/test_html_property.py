"""Property test: the Spark HTML block extractor agrees with an
independent Python `re` model on randomized small pages (hypothesis).

The model re-implements the semantics directly (strip noise -> split on
block tags -> per-block collapse/anchor features -> keep rule) with
Python's regex engine — a third engine besides Spark (Java regex) and the
DuckDB oracle (RE2), so a pattern that means something different in any
engine's dialect shows up as a counterexample here or in the driver gate."""

import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_extractor_spark.operators.html import (
    ANCHOR_RE,
    BLOCK_SPLIT_RE,
    DEFAULT_MAX_LINK_DENSITY,
    DEFAULT_MIN_TEXT_LEN,
    INLINE_TAG_RE,
    WS_RE,
    html_blocks,
)

WORDS = ["alpha", "beta", "gamma", "delta", "longer words here", "x" * 30]
TAGS = ["p", "div", "li", "h2", "td", "nav", "footer", "br"]


def _model_blocks(html: str):
    s = html
    for tag in ("script", "style", "noscript"):
        s = re.sub(rf"(?is)<{tag}(?:\s[^>]*)?>.*?</{tag}>", " ", s)
    s = re.sub(r"(?s)<!--.*?-->", " ", s)
    out = []
    for frag in re.split(BLOCK_SPLIT_RE, s):
        txt = re.sub(WS_RE, " ", re.sub(INLINE_TAG_RE, " ", frag)).strip(" ")
        if not txt:
            continue
        link_len = sum(
            len(
                re.sub(
                    WS_RE, " ", re.sub(INLINE_TAG_RE, " ", inner)
                ).strip(" ")
            )
            for inner in re.findall(ANCHOR_RE, frag)
        )
        keep = (
            len(txt) >= DEFAULT_MIN_TEXT_LEN
            and link_len <= DEFAULT_MAX_LINK_DENSITY * len(txt)
        )
        out.append((txt, len(txt), link_len, keep))
    return out


@st.composite
def page(draw):
    n = draw(st.integers(1, 6))
    parts = ["<html><body>"]
    for _ in range(n):
        kind = draw(st.integers(0, 4))
        word = draw(st.sampled_from(WORDS))
        tag = draw(st.sampled_from(TAGS))
        if kind == 0:
            parts.append(f"<{tag}>{word} {word}</{tag}>")
        elif kind == 1:
            parts.append(f'<p><a href="/x">{word}</a> {word}</p>')
        elif kind == 2:
            parts.append(f"<script>var x = '{word}';</script>")
        elif kind == 3:
            parts.append(f"<!-- {word} -->")
        else:
            parts.append(f"<div>{word}<b>{word}</b>\t{word}</div>")
    parts.append("</body></html>")
    return "".join(parts)


@settings(max_examples=25, deadline=None)
@given(pages=st.lists(page(), min_size=1, max_size=8))
def test_spark_matches_python_model(spark, pages):
    df = spark.createDataFrame(
        list(enumerate(pages)), "doc_id long, html string"
    )
    got = {}
    for r in html_blocks(df).collect():
        got.setdefault(r.doc_id, []).append(
            (r.txt, r.text_len, r.link_len, r.keep)
        )
    for i, html in enumerate(pages):
        assert got.get(i, []) == _model_blocks(html), html
