"""Property test: filter_spans_by_page vs a direct Python model of the
reference semantics (extractor.py:46-51,62,73-74) over randomized span
arrays — offsets shuffled, media interleaved arbitrarily, any page set."""

import random

import pytest

from pdf_extractor_spark.operators.spans import filter_spans_by_page, parse_pages


def _model(spans, pages):
    """Pure-Python reference: sort by offset; page of a span = number of
    text spans at or before it minus 1; keep pages in the parsed set."""
    wanted = parse_pages(pages)
    if wanted is None:
        return list(spans)  # 'all' is a no-op: original order, no sort
    ordered = sorted(spans, key=lambda s: s[3])
    out, n_text = [], 0
    for kind, text, ref, off in ordered:
        if kind == "text":
            n_text += 1
        if (n_text - 1) in wanted:
            out.append((kind, text, ref, off))
    return out


@pytest.mark.parametrize("seed", range(6))
def test_matches_python_model(spark, seed):
    rng = random.Random(seed)
    rows = []
    expected = {}
    pages_arg = rng.choice(["all", 0, 1, "0,2", "1,3,99", 7])
    for d in range(20):
        n = rng.randint(0, 10)
        offs = rng.sample(range(50), n)
        spans = []
        for i, off in enumerate(offs):
            if rng.random() < 0.3:
                spans.append(("image", None, f"m{i}", off))
            else:
                spans.append(("text", f"t{d}-{i}", None, off))
        rng.shuffle(spans)
        rows.append((f"d{d}", spans))
        expected[f"d{d}"] = _model(spans, pages_arg)

    df = spark.createDataFrame(
        rows,
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    got = {
        r.doc_id: [(s.kind, s.text, s.media_ref, s.offset) for s in r.spans]
        for r in filter_spans_by_page(df, pages_arg).collect()
    }
    assert got == expected, f"pages={pages_arg!r} seed={seed}"
