"""chunk_documents: hand-computed window arithmetic (counts, overlap
content, redundant-tail suppression, empty-doc drop) plus the scale pin —
the chunking plan must contain no Exchange (zero shuffle)."""

from pdf_extractor_spark.operators.textstats import chunk_documents


def _df(spark):
    rows = [
        (1, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"),  # 10 tokens
        (2, "a b c"),          # shorter than one window -> 1 chunk of 3
        (3, "x " * 6),         # exactly 6 tokens -> exactly 1 chunk
        (4, ""),               # empty -> no rows
        (5, None),             # null -> no rows
        (6, "p q r s t u v"),  # 7 tokens -> 2 chunks (second adds 1 token)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_windows_hand_computed(spark):
    out = chunk_documents(_df(spark), chunk_size=6, overlap=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for chunks in by_doc.values():
        chunks.sort(key=lambda r: r.chunk_id)

    # doc 1: 10 tokens, stride 4 -> n_chunks = 1 + ceil((10-6)/4) = 2
    assert [r.chunk_id for r in by_doc[1]] == [0, 1]
    assert by_doc[1][0].chunk_text == "t0 t1 t2 t3 t4 t5"
    # second window starts at stride=4 and overlaps the first by 2 tokens
    assert by_doc[1][1].chunk_text == "t4 t5 t6 t7 t8 t9"
    assert by_doc[1][1].n_chunk_tokens == 6

    # short doc: single partial chunk, no padding
    assert len(by_doc[2]) == 1 and by_doc[2][0].chunk_text == "a b c"
    assert by_doc[2][0].n_chunk_tokens == 3

    # exactly one window of tokens -> exactly one chunk (no empty tail)
    assert len(by_doc[3]) == 1 and by_doc[3][0].n_chunk_tokens == 6

    # empty / null docs emit nothing
    assert 4 not in by_doc and 5 not in by_doc

    # 7 tokens: tail window starts at stride=4, carries 1 new token
    assert len(by_doc[6]) == 2
    assert by_doc[6][1].chunk_text == "t u v"
    assert by_doc[6][1].n_chunk_tokens == 3


def test_chunk_plan_has_no_shuffle(spark):
    plan = (
        chunk_documents(_df(spark), chunk_size=6, overlap=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_chunk_rejects_bad_overlap(spark):
    import pytest

    with pytest.raises(ValueError):
        chunk_documents(_df(spark), chunk_size=8, overlap=8)
