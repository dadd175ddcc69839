"""acronym_extract, unit_normalize, list_detect, column_conformance."""


def test_acronym_valid_invalid_and_decoy(spark):
    from pdf_extractor_spark.operators.keywords import acronym_extract

    df = spark.createDataFrame(
        [
            (1, "the alpha beta (AB) done (Z)"),     # valid
            (2, "the alpha beta (AQ) done"),          # mismatch
            (3, "(AB) leading cannot resolve"),       # p <= len
            (4, "alpha beta (AB) and gamma delta (GD)"),
        ],
        "doc_id long, atext string",
    )
    got = {
        r.doc_id: (r.n_candidates, r.n_valid, r.first_acronym)
        for r in acronym_extract(df).collect()
    }
    assert got[1] == (1, 1, "AB")
    assert got[2] == (1, 0, None)
    assert got[3] == (1, 0, None)
    assert got[4] == (2, 2, "AB")


def test_acronym_synthesis_q_case(spark):
    from pdf_extractor_spark.operators.keywords import (
        acronym_extract,
        synthesize_acronyms,
    )

    # doc 6 (% 3 == 0) gets 'Q' as second initial, but t2 = 'quick'
    # starts with q -> genuinely valid
    df = spark.createDataFrame(
        [(3, "alpha beta x"), (6, "query quick run")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_valid, r.first_acronym)
        for r in acronym_extract(synthesize_acronyms(df)).collect()
    }
    assert got[3] == (0, None)
    assert got[6] == (1, "QQ")


def test_unit_normalize_hand_computed(spark):
    from pdf_extractor_spark.operators.curation import unit_normalize

    df = spark.createDataFrame(
        [
            (1, "size 3 kb and 2 mb plus 12 zz"),
            (2, "no quantities"),
        ],
        "doc_id long, utext string",
    )
    got = {
        r.doc_id: (r.n_quantities, r.total_bytes)
        for r in unit_normalize(df).collect()
    }
    assert got[1] == (2, 3 * 1024 + 2 * 1024 * 1024)
    assert got[2] == (0, 0)


def test_unit_synthesis(spark):
    from pdf_extractor_spark.operators.curation import (
        synthesize_quantities,
        unit_normalize,
    )

    # doc 4: v=5, unit mb (4%3==1), extra '7 kb' (4%4==0), decoy skipped
    df = spark.createDataFrame([(4, "x")], "doc_id long, text string")
    r = unit_normalize(synthesize_quantities(df)).collect()[0]
    assert (r.n_quantities, r.total_bytes) == (2, 5 * 1024 * 1024 + 7 * 1024)


def test_list_detect_hand_computed(spark):
    from pdf_extractor_spark.operators.layout import list_detect

    df = spark.createDataFrame(
        [
            (1, "prose\n- a\n- b\nprose\n* c\nprose"),
            (2, "only prose\nno items"),
        ],
        "doc_id long, ltext string",
    )
    got = {
        r.doc_id: (r.n_lists, r.n_items, r.max_list_len)
        for r in list_detect(df).collect()
    }
    assert got[1] == (2, 3, 2)
    assert got[2] == (0, 0, 0)


def test_list_synthesis(spark):
    from pdf_extractor_spark.operators.layout import (
        list_detect,
        synthesize_lists,
    )

    # doc 5: block1 = 5%4 = 1 item, block2 = 5%3 = 2 items
    # doc 12: block1 = 0 items (vanishes), block2 = 0 -> no lists
    df = spark.createDataFrame(
        [(5, "x"), (12, "x")], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_lists, r.n_items, r.max_list_len)
        for r in list_detect(synthesize_lists(df)).collect()
    }
    assert got[5] == (2, 3, 2)
    assert got[12] == (0, 0, 0)


def test_column_conformance_catches_drift(spark):
    from pdf_extractor_spark.operators.maintenance import (
        column_conformance,
        synthesize_meta_drift,
    )

    df = spark.createDataFrame(
        [
            (9, "abcde", "s1", 5),   # 9 % 9 == 0 -> drift 1 + 9%5 = 5
            (1, "abc", "s1", 3),
            (2, "abcd", "s2", 4),
        ],
        "doc_id long, text string, source string, n_chars long",
    )
    got = {
        r.source: (r.n_rows, r.n_mismatch, r.max_abs_dev)
        for r in column_conformance(synthesize_meta_drift(df)).collect()
    }
    assert got["s1"] == (2, 1, 5)
    assert got["s2"] == (1, 0, 0)
