"""c4_filter: C4 cleaning rules (the T5 corpus recipe) over
newline-structured pages, plus the deterministic page synthesis."""

from pdf_extractor_spark.operators.curation import c4_filter, synthesize_pages


def test_c4_filter_hand_computed(spark):
    rows = [
        (
            1,
            "one two three four five.\nshort line.\n"
            "no terminal punct here at all\nsix seven eight nine ten!\n"
            "Q marks also count here ok?",
        ),
        (
            2,
            "brace { page with five words.\nanother good line here now.\n"
            "third good line right here.",
        ),
        (
            3,
            "lorem ipsum appears right here today.\na b.\n"
            "good line with five words.",
        ),
        (
            4,
            "casino word triggers the blocklist here.\n"
            "more good words in line.\nthird fine line here too.",
        ),
        (5, "only two sentences here now.\nsecond full line is here."),
        (6, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, page string")
    got = {r.doc_id: r for r in c4_filter(df).collect()}

    r1 = got[1]
    # kept = lines ending in terminal punct AND >= 5 words: lines 1, 4, 5
    assert (r1.n_lines, r1.n_kept, r1.n_sentences) == (5, 3, 3)
    assert r1.accept
    assert not (r1.has_brace or r1.has_lorem or r1.has_badword)
    assert r1.clean_text.count("\n") == 2

    assert got[2].has_brace and not got[2].accept
    assert got[3].has_lorem and not got[3].accept
    assert got[4].has_badword and not got[4].accept

    # page rules pass but only 2 sentences survive -> reject
    r5 = got[5]
    assert (r5.n_kept, r5.n_sentences, bool(r5.accept)) == (2, 2, False)

    # null page: one empty line, nothing kept, reject — never an error
    r6 = got[6]
    assert (r6.n_lines, r6.n_kept, r6.n_sentences, bool(r6.accept)) == (
        1,
        0,
        0,
        False,
    )
    assert r6.clean_text == ""


def test_synthesize_pages_hand_computed(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g h")], "doc_id long, text string"
    )
    page = synthesize_pages(df).collect()[0].page
    # 8 tokens -> two 6-token lines; i=1 has m=(1+1)%5=2 -> full + '.',
    # i=2 has m=3 -> partial chunk 'g h' + '.'
    assert page == "a b c d e f.\ng h."

    p0 = (
        synthesize_pages(
            spark.createDataFrame([(0, "x y z")], "doc_id long, text string")
        )
        .collect()[0]
        .page
    )
    # doc 0: m=(0+1)%5=1 -> truncated to 3 words + '.'; 0 % 17/19/23 == 0
    # appends all three page poisons
    assert p0 == (
        "x y z.\nlorem ipsum dolor sit amet today."
        "\nvar f = function() { return 1; }."
        "\ncasino jackpot bonus spins here now."
    )


def test_c4_filter_zero_shuffle(spark):
    df = spark.createDataFrame([(1, "a. b c")], "doc_id long, page string")
    phys = c4_filter(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in phys
