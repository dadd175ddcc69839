"""Sinks (SURVEY.md §2.1) round-trips and the --py-files packaging artifact."""

import os
import subprocess
import sys

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def small_df(spark):
    return spark.createDataFrame(
        [("d1", "invoice", 0.9, {"total": "10,00"}),
         ("d2", None, 0.0, {}),
         ("d3", "receipt", 0.7, {"valor": "R$ 1,50"})],
        "doc_id string, doc_type string, confidence double, fields map<string,string>",
    )


def test_export_csv_roundtrip(spark, small_df, tmp_path):
    from pdf_extractor_spark.sinks import export_csv

    path = str(tmp_path / "csv_out")
    export_csv(small_df, path, single_file=True)
    back = spark.read.option("header", True).csv(path)
    assert back.count() == 3
    assert set(back.columns) == {"doc_id", "doc_type", "confidence", "fields"}
    # complex column serialized as JSON text
    row = {r.doc_id: r.fields for r in back.collect()}
    assert row["d1"] == '{"total":"10,00"}'


def test_export_json_roundtrip(spark, small_df, tmp_path):
    from pdf_extractor_spark.sinks import export_json

    path = str(tmp_path / "json_out")
    export_json(small_df, path, single_file=True)
    back = spark.read.json(path)
    got = {r.doc_id: r.confidence for r in back.collect()}
    assert got == {"d1": 0.9, "d2": 0.0, "d3": 0.7}


def test_export_sqlite(spark, small_df, tmp_path):
    import sqlite3

    from pdf_extractor_spark.sinks import export_sql

    db = str(tmp_path / "out.db")
    export_sql(small_df, "extracted", sqlite_path=db)
    con = sqlite3.connect(db)
    rows = con.execute(
        "SELECT doc_id, doc_type FROM extracted ORDER BY doc_id"
    ).fetchall()
    con.close()
    assert rows == [("d1", "invoice"), ("d2", None), ("d3", "receipt")]


def test_export_excel_gated(spark, small_df, tmp_path):
    from pdf_extractor_spark.sinks import export_excel

    path = str(tmp_path / "out.xlsx")
    sheet_name_33 = "a_very_long_sheet_name_over_31ch!"
    try:
        export_excel({sheet_name_33: small_df}, path)
    except NotImplementedError:
        pytest.skip("no Excel engine in runtime (documented stub)")
    import pandas as pd

    back = pd.read_excel(path, sheet_name=None)
    assert list(back) == [sheet_name_33[:31]]  # 31-char truncation


def test_spans_to_page_rows(spark):
    from pdf_extractor_spark.sinks import spans_to_page_rows

    df = spark.createDataFrame(
        [("d1", [("text", "hello", None, 0, 0), ("image", None, "m://1", 1, 1),
                 ("text", "world", None, 2, 2)])],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int,order:int>>",
    )
    rows = spans_to_page_rows(df).orderBy("order").collect()
    assert [(r.page, r.content) for r in rows] == [
        ("page_1", "hello"), ("page_3", "world")
    ]


def test_pyfiles_zip_imports_standalone(tmp_path):
    """Build dist zip and import the package from it in a clean interpreter
    with ONLY the zip on sys.path (plus site-packages) — proves --py-files
    shipping works and conf JSON travels inside the artifact."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tools.make_package import build

    zip_path = build(str(tmp_path))
    probe = (
        "import sys; sys.path.insert(0, %r); "
        "import pdf_extractor_spark.pipeline, pdf_extractor_spark.sinks; "
        "from pdf_extractor_spark.config import load_patterns, load_templates; "
        "p = load_patterns(); t = load_templates(); "
        "assert 'invoice' in p and 'invoice' in t, (list(p), list(t)); "
        "print('ZIP_OK', len(p))" % zip_path
    )
    out = subprocess.run(
        [sys.executable, "-c", probe],
        capture_output=True, text=True,
        cwd=str(tmp_path),  # away from the repo so only the zip provides it
        timeout=120,
    )
    assert out.returncode == 0, out.stderr
    assert "ZIP_OK" in out.stdout
