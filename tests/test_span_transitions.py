"""span_kind_transitions — hand-computed over a tiny interleaved doc."""

from pdf_extractor_spark.operators.multimodal import (
    span_kind_transitions,
    synthesize_interleaved,
)


def test_span_kind_transitions(spark):
    # doc 0, 12 tokens -> 3 spans, kinds for i=0,1,2 with (0+i)%3==0:
    # image, text, text -> transitions image->text, text->text
    rows = [(0, " ".join(f"w{i}" for i in range(12)))]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    spans = synthesize_interleaved(df)
    got = {(r.kind_a, r.kind_b): r for r in span_kind_transitions(spans).collect()}
    assert set(got) == {("image", "text"), ("text", "text")}
    assert got[("image", "text")].n == 1
    assert got[("image", "text")].p == 1.0
    assert got[("text", "text")].n == 1


def test_span_transitions_offset_sort_required(spark):
    # two docs to exercise the arbitrary (reversed) array order: the lag
    # must follow offsets, not array positions
    rows = [(1, " ".join(f"w{i}" for i in range(24)))]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.kind_a, r.kind_b): r.n for r in span_kind_transitions(
        synthesize_interleaved(df)
    ).collect()}
    # doc 1, 6 spans; kinds for i=0..5 with (1+i)%3==0 at i=2,5:
    # text,text,image,text,text,image ->
    # t->t (2: i0->i1, i3->i4), t->i (2: i1->i2, i4->i5), i->t (1: i2->i3)
    assert got[("text", "text")] == 2
    assert got[("text", "image")] == 2
    assert got[("image", "text")] == 1
    assert ("image", "image") not in got
