"""sentence_segment + badword_filter: hand-computed segmentation stats
and blocklist filtering with leet normalization."""


def test_sentence_segment_hand_computed(spark):
    from pdf_extractor_spark.operators.textstats import sentence_segment

    # tokens: [Dr. | a b. | c d? | e]  -> 'Dr.' is an abbreviation (no
    # split); sentences: [Dr. a b.] [c d?] [e] -> 3 sentences, last
    # unterminated; lengths 3, 2, 1 -> avg 2.0, short(<4)=3/3
    df = spark.createDataFrame(
        [(1, "Dr. a b. c d? e")], "doc_id long, stext string"
    )
    r = sentence_segment(df).collect()[0]
    assert (r.n_sentences, r.avg_tokens, r.short_frac, r.unterminated) == (
        3, 2.0, 1.0, 1,
    )


def test_sentence_segment_terminated_tail(spark):
    from pdf_extractor_spark.operators.textstats import sentence_segment

    df = spark.createDataFrame(
        [(1, "w x y z. q.")], "doc_id long, stext string"
    )
    r = sentence_segment(df).collect()[0]
    assert (r.n_sentences, r.unterminated) == (2, 0)
    assert r.avg_tokens == 2.5
    assert r.short_frac == 0.5  # [w x y z.] has 4 tokens (not short)


def test_synthesize_sentences_shape(spark):
    from pdf_extractor_spark.operators.textstats import (
        sentence_segment,
        synthesize_sentences,
    )

    # 12 tokens: i=0 -> 'Dr.', i=4,9 -> '.', i=7 -> '?'
    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(12)))],
        "doc_id long, text string",
    )
    s = synthesize_sentences(df).collect()[0].stext
    assert s.split(" ")[0] == "Dr."
    assert s.split(" ")[4] == "t4."
    assert s.split(" ")[7] == "t7?"
    r = sentence_segment(synthesize_sentences(df)).collect()[0]
    # sentences: [Dr. t1 t2 t3 t4.] [t5 t6 t7?] [t8 t9.] [t10 t11]
    assert (r.n_sentences, r.unterminated) == (4, 1)
    assert r.avg_tokens == 3.0
    assert r.short_frac == 0.75


def test_badword_filter_normalizes_leet(spark):
    from pdf_extractor_spark.operators.curation import badword_filter

    # '5l0w' -> 'slow' (flagged), 'b1g' -> 'big' (flagged), 'BIG' ->
    # lowercased (flagged), 'fast' clean
    df = spark.createDataFrame(
        [(1, "5l0w b1g BIG fast")], "doc_id long, otext string"
    )
    r = badword_filter(df).collect()[0]
    assert (r.n_tokens, r.n_flagged, r.keep) == (4, 3, False)
    assert r.flagged_frac == 0.75


def test_badword_filter_keep_threshold(spark):
    from pdf_extractor_spark.operators.curation import badword_filter

    clean = " ".join(["fast"] * 24) + " slow"  # 1/25 = 0.04 < 0.08
    dirty = " ".join(["fast"] * 9) + " slow"   # 1/10 = 0.10 >= 0.08
    df = spark.createDataFrame(
        [(1, clean), (2, dirty)], "doc_id long, otext string"
    )
    got = {r.doc_id: r.keep for r in badword_filter(df).collect()}
    assert got == {1: True, 2: False}


def test_badword_synthesis_roundtrip(spark):
    from pdf_extractor_spark.operators.curation import (
        badword_filter,
        synthesize_obfuscation,
    )

    # position 0 and 13 get leetified; 'slow' at pos 0 -> '5l0w' must
    # still be caught after normalization
    text = "slow " + " ".join(["fast"] * 14)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    ob = synthesize_obfuscation(df).collect()[0].otext
    assert ob.startswith("5l0w ")
    r = badword_filter(synthesize_obfuscation(df)).collect()[0]
    assert (r.n_tokens, r.n_flagged) == (15, 1)
