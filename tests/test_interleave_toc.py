"""span_interleave_stats, media_ref_integrity, toc_extract,
footnote_link — hand-computed cases over the deterministic syntheses."""


def _docs(spark, doc_id, n_tokens=20):
    return spark.createDataFrame(
        [(doc_id, " ".join(f"t{i}" for i in range(n_tokens)))],
        "doc_id long, text string",
    )


def test_interleave_stats_hand_computed(spark):
    from pdf_extractor_spark.operators.multimodal import (
        span_interleave_stats,
        synthesize_interleaved,
    )

    # doc 3, 20 tokens -> 5 spans; media at (3+i)%3==0 -> i=0,3
    # kinds in offset order: M T T M T -> 4 runs, trans 3
    r = span_interleave_stats(
        synthesize_interleaved(_docs(spark, 3))
    ).collect()[0]
    assert (r.n_spans, r.n_text, r.n_media) == (5, 3, 2)
    assert (r.n_runs, r.max_text_run, r.max_media_run, r.transitions) == (
        4, 2, 1, 3,
    )


def test_interleave_requires_offset_sort(spark):
    from pdf_extractor_spark.operators.multimodal import (
        span_interleave_stats,
        synthesize_interleaved,
    )

    # the synthesis stores spans REVERSED; a consumer that trusted array
    # order would see the mirror sequence. Equal run stats would be a
    # coincidence of palindromes; transitions of the true order for doc
    # 4 (kinds T T M T T): 2 — assert against hand truth.
    r = span_interleave_stats(
        synthesize_interleaved(_docs(spark, 4))
    ).collect()[0]
    assert (r.n_runs, r.transitions) == (3, 2)
    assert r.max_text_run == 2


def test_media_ref_integrity_orphans(spark):
    from pdf_extractor_spark.operators.multimodal import (
        media_ref_integrity,
        synthesize_assets,
        synthesize_interleaved,
    )

    # doc 11: media spans i=1,4; (11*31+4)%5==0 -> asset for i=4 missing
    sp = synthesize_interleaved(_docs(spark, 11))
    r = media_ref_integrity(sp, synthesize_assets(_docs(spark, 11))).collect()[0]
    assert (r.n_media, r.n_orphans) == (2, 1)


def test_toc_extract_hand_computed(spark):
    from pdf_extractor_spark.operators.layout import (
        synthesize_toc,
        toc_extract,
    )

    # doc 3: 4 headings, depths 1,2,3,1
    r = toc_extract(synthesize_toc(_docs(spark, 3))).collect()[0]
    assert (r.n_entries, r.max_depth, r.n_top_level) == (4, 3, 2)


def test_toc_ignores_plain_lines(spark):
    from pdf_extractor_spark.operators.layout import toc_extract

    df = spark.createDataFrame(
        [(1, "intro\n2.3 Real Entry\nnot 1.2 an entry\n7 Top")],
        "doc_id long, ttext string",
    )
    r = toc_extract(df).collect()[0]
    assert (r.n_entries, r.max_depth, r.n_top_level) == (2, 2, 1)


def test_footnote_link_hand_computed(spark):
    from pdf_extractor_spark.operators.layout import (
        footnote_link,
        synthesize_footnotes,
    )

    # doc 5: markers 1..3, def 3 missing ((5+3)%4==0), orphan [9] (5%5==0)
    r = footnote_link(synthesize_footnotes(_docs(spark, 5))).collect()[0]
    assert (r.n_markers, r.n_resolved, r.n_dangling, r.n_orphan_defs) == (
        3, 2, 1, 1,
    )


def test_footnote_link_repeated_marker_counts_once(spark):
    from pdf_extractor_spark.operators.layout import footnote_link

    df = spark.createDataFrame(
        [(1, "see [1] and again [1] plus [2]\n[1] note")],
        "doc_id long, ftext string",
    )
    r = footnote_link(df).collect()[0]
    assert (r.n_markers, r.n_resolved, r.n_dangling, r.n_orphan_defs) == (
        2, 1, 1, 0,
    )
