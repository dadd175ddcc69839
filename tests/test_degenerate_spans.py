"""Degenerate spans-table input through the core extraction pipeline:
null/empty span arrays, null kind/text/offset fields, duplicate and
negative offsets. Every row must come out the other side (possibly as a
failure row) — never an exception."""

from pyspark.sql import types as T

from pdf_extractor_spark.pipeline import extract_documents

SPANS = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField(
            "spans",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("kind", T.StringType()),
                        T.StructField("text", T.StringType()),
                        T.StructField("media_ref", T.StringType()),
                        T.StructField("offset", T.IntegerType()),
                    ]
                )
            ),
        ),
    ]
)


def test_extract_survives_degenerate_spans(spark):
    rows = [
        ("d0", None),
        ("d1", []),
        ("d2", [("text", None, None, None)]),
        ("d3", [(None, "orphan kind", None, 0)]),
        ("d4", [("image", None, "m://1", 0), ("text", "hello world", None, 1)]),
        ("d5", [("text", "dup offset a", None, 0), ("text", "dup offset b", None, 0)]),
        ("d6", [("text", "neg", None, -5), ("text", "after", None, 2)]),
        ("d7", [("text", "\x00\x01 control", None, 0)]),
    ]
    df = spark.createDataFrame(rows, SPANS)
    out = extract_documents(df)
    got = out.collect()
    assert len(got) == len(rows)
    assert {r.doc_id for r in got} == {f"d{i}" for i in range(8)}
    # d4's text span survives the null-text image sibling: both spans come
    # back ordered, no per-doc error
    d4 = next(r for r in got if r.doc_id == "d4")
    assert d4.error is None
    assert [s.kind for s in d4.spans] == ["image", "text"]
    assert d4.spans[1].text == "hello world"
