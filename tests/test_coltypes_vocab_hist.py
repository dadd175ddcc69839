"""table_column_types, vocab_prune, value_histogram, reciprocity."""


def test_table_column_types_hand_computed(spark):
    from pdf_extractor_spark.operators.layout import table_column_types

    rows = [
        # (doc, table, row, col, cell)
        (1, 0, 0, 0, "name"), (1, 0, 0, 1, "qty"), (1, 0, 0, 2, "price"),
        (1, 0, 1, 0, "apple"), (1, 0, 1, 1, "3"), (1, 0, 1, 2, "4.5"),
        (1, 0, 2, 0, "pear"), (1, 0, 2, 1, "-7"), (1, 0, 2, 2, "2"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, table_idx int, row_idx int, col_idx int, cell string"
    )
    got = {
        r.col_idx: (r.header, r.n_rows, r.dtype)
        for r in table_column_types(df).collect()
    }
    assert got[0] == ("name", 2, "text")
    assert got[1] == ("qty", 2, "int")
    # mixed int + decimal -> num
    assert got[2] == ("price", 2, "num")


def test_table_column_types_header_only(spark):
    from pdf_extractor_spark.operators.layout import table_column_types

    df = spark.createDataFrame(
        [(1, 0, 0, 0, "lonely")],
        "doc_id long, table_idx int, row_idx int, col_idx int, cell string",
    )
    r = table_column_types(df).collect()[0]
    assert (r.n_rows, r.dtype) == (0, "text")


def test_vocab_prune_hand_computed(spark):
    from pdf_extractor_spark.operators.textstats import vocab_prune

    # counts: a=6, b=3, c=1 -> total 10; 99% needs all 3 tokens;
    # cov at rank 10/50 undefined (vocab of 3) -> nulls
    df = spark.createDataFrame(
        [(1, "a a a b b c"), (2, "a a a b")], "doc_id long, text string"
    )
    r = vocab_prune(df).collect()[0]
    assert (r.n_total, r.n_vocab, r.size_at_pct) == (10, 3, 3)
    assert r.cov_at_10 is None and r.cov_at_50 is None


def test_value_histogram_hand_computed(spark):
    from pdf_extractor_spark.operators.events import value_histogram

    # values 0..10: width 1 buckets [0,1)...[9,10]; 10 lands in bucket 9
    rows = [(i, float(i)) for i in range(11)]
    df = spark.createDataFrame(rows, "event_id long, value double")
    got = {r.bucket: r for r in value_histogram(df).collect()}
    assert got[0].n == 1 and got[0].lo == 0.0 and got[0].hi == 1.0
    assert got[9].n == 2  # 9 and the max 10
    assert sum(r.n for r in got.values()) == 11


def test_reciprocity_hand_computed(spark):
    from pdf_extractor_spark.operators.graph import reciprocity

    df = spark.createDataFrame(
        [
            ("a", "b"), ("b", "a"),       # mutual
            ("a", "c"),                    # one-way
            ("c", "c"),                    # self-loop dropped
            ("a", "b"),                    # duplicate edge
        ],
        "src string, dst string",
    )
    got = {r.src: (r.out_deg, r.n_recip) for r in reciprocity(df).collect()}
    assert got["a"] == (2, 1)
    assert got["b"] == (1, 1)
    assert "c" not in got  # only had a self-loop
