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


def test_export_excel(spark, small_df, tmp_path):
    """Runs in every runtime: with no pandas Excel engine installed the
    sink falls back to the built-in minimal OOXML writer; validate the
    produced package by parsing its zip/XML parts directly."""
    import xml.etree.ElementTree as ET
    import zipfile

    from pdf_extractor_spark.sinks import export_excel

    path = str(tmp_path / "out.xlsx")
    sheet_name_33 = "a_very_long_sheet_name_over_31ch!"
    export_excel({sheet_name_33: small_df}, path)

    with zipfile.ZipFile(path) as z:
        names = set(z.namelist())
        assert {"[Content_Types].xml", "xl/workbook.xml",
                "xl/worksheets/sheet1.xml"} <= names
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        ns = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
        sheets = [s.get("name") for s in wb.iter(f"{ns}sheet")]
        assert sheets == [sheet_name_33[:31]]  # 31-char truncation
        ws = ET.fromstring(z.read("xl/worksheets/sheet1.xml"))
        texts = [t.text for t in ws.iter(f"{ns}t")]
        assert "doc_id" in texts and "d1" in texts  # header + a value
        rows = list(ws.iter(f"{ns}row"))
        assert len(rows) == 1 + small_df.count()


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


def test_spark_submit_pyfiles_end_to_end(tmp_path):
    """The north-rule shipping shape, literally: rebuild the dist zip, run
    `spark-submit --py-files dist.zip jobs/run_extract.py` as a fresh
    subprocess (its own JVM/session, package importable ONLY via
    --py-files from a scratch cwd), and check the committed output."""
    import glob
    import shutil
    import subprocess
    import sys

    from tools.make_package import build

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zpath = build()
    spark_submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
    job = os.path.join(tmp_path, "run_extract.py")
    shutil.copy(os.path.join(repo, "jobs", "run_extract.py"), job)
    out = os.path.join(tmp_path, "out")
    env = dict(os.environ, PYSPARK_PYTHON=sys.executable,
               PYSPARK_DRIVER_PYTHON=sys.executable)
    proc = subprocess.run(
        [
            spark_submit, "--master", "local[2]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--py-files", zpath, job,
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--format", "parquet", "--input-kind", "documents",
            "--output", out, "--buckets", "4", "--salts", "2",
        ],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=480,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    data = glob.glob(os.path.join(out, "extracted", "**", "*.parquet"),
                     recursive=True)
    metrics = glob.glob(os.path.join(out, "metrics", "**", "*.parquet"),
                        recursive=True)
    assert data and metrics
