"""extract_text_tables: pipe-table grid reconstruction — islands split
tables at non-table lines, header is row 0, cells trim, and the whole
plan rides one doc_id shuffle."""

from pdf_extractor_spark.operators.layout import extract_text_tables


def _cells(spark, rows):
    df = spark.createDataFrame(rows, "doc_id string, text string")
    return {
        (r.doc_id, r.table_idx, r.row_idx, r.col_idx): r.cell
        for r in extract_text_tables(df).collect()
    }


def test_two_tables_split_by_plain_line(spark):
    text = "intro\na | b\n1 | 2\nplain separator\nx | y | z\n3 | 4 | 5"
    got = _cells(spark, [("d1", text)])
    assert got[("d1", 0, 0, 0)] == "a" and got[("d1", 0, 0, 1)] == "b"
    assert got[("d1", 0, 1, 0)] == "1" and got[("d1", 0, 1, 1)] == "2"
    assert got[("d1", 1, 0, 2)] == "z"
    assert got[("d1", 1, 1, 1)] == "4"
    assert len(got) == 4 + 6


def test_cells_trimmed_and_pipe_without_spaces_ignored(spark):
    got = _cells(spark, [("d1", "  padded  |  cell  \nnot|a|table")])
    # 'not|a|table' has no ' | ' delimiter -> not a table line
    assert got == {
        ("d1", 0, 0, 0): "padded",
        ("d1", 0, 0, 1): "cell",
    }


def test_no_tables_and_null_text(spark):
    got = _cells(spark, [("d1", "just prose"), ("d2", None)])
    assert got == {}


def test_single_doc_shuffle(spark):
    df = spark.createDataFrame([("d1", "a | b")], "doc_id string, text string")
    plan = (
        extract_text_tables(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan
