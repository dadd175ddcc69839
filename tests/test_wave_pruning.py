"""Wave pruning on a bucket-partitioned input (round-1 verdict #9): with
write-time bucket partitioning (the Iceberg bucket-transform analog),
each wave's `bucket IN (...)` filter prunes at the scan instead of
re-reading the full corpus — and results are identical to the
unpartitioned path."""

import pytest
from pyspark.sql import functions as F

from pdf_extractor_spark.pipeline import run_pipeline, write_bucketed_input
from pdf_extractor_spark.sources.corpus import SPANS_SCHEMA, corpus_rows


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (did, [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans])
        for did, spans in corpus_rows(200)
    ]
    return spark.createDataFrame(rows, SPANS_SCHEMA)


def test_bucketed_scan_prunes(spark, docs, tmp_path):
    path = str(tmp_path / "bucketed")
    write_bucketed_input(docs, path, num_buckets=8)
    b = spark.read.parquet(path)
    sub = b.filter(F.col("bucket").isin([0, 2]))
    plan = sub._jdf.queryExecution().executedPlan().toString()
    scan = next(l for l in plan.splitlines() if "FileScan" in l)
    # the bucket predicate must be a partition filter (prunes directories),
    # NOT a data filter (full scan + row filter)
    assert "DataFilters: []" in scan
    assert sub.count() < b.count()


def test_waves_prebucketed_matches_unpartitioned(spark, docs, tmp_path):
    path = str(tmp_path / "bucketed_in")
    write_bucketed_input(docs, path, num_buckets=8)
    pre = spark.read.parquet(path)

    out_a = str(tmp_path / "out_raw")
    out_b = str(tmp_path / "out_pre")
    run_pipeline(spark, docs, out_a, run_id="raw", num_buckets=8, waves=1)
    run_pipeline(spark, pre, out_b, run_id="pre", num_buckets=8, waves=2)

    a = {
        (r.doc_id, r.doc_type)
        for r in spark.read.parquet(out_a + "/extracted").collect()
    }
    b = {
        (r.doc_id, r.doc_type)
        for r in spark.read.parquet(out_b + "/extracted").collect()
    }
    assert a == b and len(a) == docs.count()
