"""keyword_rake + reverse_search: hand-computed RAKE scores and
conjunctive stored-query matching."""


def test_rake_hand_computed(spark):
    from pdf_extractor_spark.operators.keywords import keyword_rake

    # phrases: [spark join] [window] [spark]
    #   freq:   spark 2, join 1, window 1
    #   degree: spark 2+1=3, join 2, window 1
    #   score:  spark 1.5, join 2.0, window 1.0
    # phrase scores: 'spark join' 3.5, 'window' 1.0, 'spark' 1.5
    df = spark.createDataFrame(
        [(1, "spark join the window a spark")], "doc_id long, text string"
    )
    rows = keyword_rake(df, top_k=3).orderBy("rank").collect()
    got = [(r.rank, r.phrase, r.score) for r in rows]
    assert got == [
        (1, "spark join", 3.5),
        (2, "spark", 1.5),
        (3, "window", 1.0),
    ]


def test_rake_duplicate_phrase_collapses(spark):
    from pdf_extractor_spark.operators.keywords import keyword_rake

    # 'fast' appears as the same single-token phrase twice: freq 2,
    # degree 2, score 1.0 both times -> ONE distinct ranked row
    df = spark.createDataFrame(
        [(1, "fast a fast")], "doc_id long, text string"
    )
    rows = keyword_rake(df, top_k=5).collect()
    assert [(r.rank, r.phrase, r.score) for r in rows] == [(1, "fast", 1.0)]


def test_rake_all_stopwords_doc_absent(spark):
    from pdf_extractor_spark.operators.keywords import keyword_rake

    df = spark.createDataFrame(
        [(1, "a the a"), (2, "join")], "doc_id long, text string"
    )
    rows = keyword_rake(df).collect()
    assert {r.doc_id for r in rows} == {2}


def test_reverse_search_conjunctive(spark):
    from pdf_extractor_spark.operators.keywords import reverse_search

    df = spark.createDataFrame(
        [
            (1, "spark join fast"),      # matches q1 (spark+join)
            (2, "spark window"),         # matches nothing fully
            (3, "window merge batch x"), # matches q2
            (4, "vector"),               # matches q4
        ],
        "doc_id long, text string",
    )
    got = {
        r.query_id: (r.n_terms, r.n_docs, r.first_doc)
        for r in reverse_search(df).collect()
    }
    assert got[1] == (2, 1, 1)
    assert got[2] == (3, 1, 3)
    assert got[3] == (3, 0, None)   # slow+fast+query: nobody has all 3
    assert got[4] == (1, 1, 4)
    assert got[5] == (2, 0, None)   # nosuchterm never matches
    assert set(got) == {1, 2, 3, 4, 5}


def test_reverse_search_repeated_term_counts_once(spark):
    from pdf_extractor_spark.operators.keywords import reverse_search

    # 'spark spark' must NOT satisfy the 2-term query (spark, join)
    df = spark.createDataFrame(
        [(9, "spark spark spark")], "doc_id long, text string"
    )
    got = {r.query_id: r.n_docs for r in reverse_search(df).collect()}
    assert got[1] == 0
