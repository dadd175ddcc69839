"""Checkpoint/resume idempotency (north_rule: 'resumable from checkpoint
with per-partition lineage + metrics'; BASELINE.md 'resume idempotency').

Scenario: run the bucketed pipeline in waves, crash after the first wave,
re-run with resume. The final extracted table must be byte-identical to an
uninterrupted run, and the lineage/metrics table must hold exactly one row
per document (no duplicates from the re-run).
"""

import os

import pytest
from pyspark.sql import functions as F

from pdf_extractor_spark.pipeline import run_pipeline
from pdf_extractor_spark.sources.corpus import SPANS_SCHEMA, corpus_rows

N_DOCS = 120
BUCKETS = 8
WAVES = 4


def _docs_df(spark):
    rows = [
        (did, [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans])
        for did, spans in corpus_rows(N_DOCS)
    ]
    return spark.createDataFrame(rows, SPANS_SCHEMA)


def _canon(df):
    rows = df.select(
        "doc_id",
        F.to_json(F.struct("spans", "doc_type", "confidence", "fields",
                           "validation", "meta")).alias("payload"),
    ).collect()
    return sorted((r.doc_id, r.payload) for r in rows)


@pytest.fixture(scope="module")
def outputs(spark, tmp_path_factory):
    docs = _docs_df(spark)

    clean_dir = str(tmp_path_factory.mktemp("clean"))
    run_pipeline(spark, docs, clean_dir, run_id="clean", num_buckets=BUCKETS,
                 waves=WAVES)

    crash_dir = str(tmp_path_factory.mktemp("crash"))
    with pytest.raises(RuntimeError, match="simulated failure"):
        run_pipeline(spark, docs, crash_dir, run_id="r1", num_buckets=BUCKETS,
                     waves=WAVES, fail_after_wave=0)
    return docs, clean_dir, crash_dir


def test_crash_left_partial_state(spark, outputs):
    _docs, _clean_dir, crash_dir = outputs
    metrics = spark.read.parquet(os.path.join(crash_dir, "metrics"))
    done = metrics.select("partition_id").distinct().count()
    assert 0 < done < BUCKETS, "crash should leave some but not all buckets"


def test_resume_completes_and_matches_clean_run(spark, outputs):
    docs, clean_dir, crash_dir = outputs
    summary = run_pipeline(spark, docs, crash_dir, run_id="r1",
                           num_buckets=BUCKETS, waves=WAVES, resume=True)
    assert summary["waves_run"] > 0

    clean = spark.read.parquet(os.path.join(clean_dir, "extracted"))
    resumed = spark.read.parquet(os.path.join(crash_dir, "extracted"))
    assert _canon(resumed.drop("bucket")) == _canon(clean.drop("bucket"))


def test_no_duplicate_metrics_rows(spark, outputs):
    _docs, _clean_dir, crash_dir = outputs
    metrics = spark.read.parquet(os.path.join(crash_dir, "metrics")).filter(
        F.col("run_id") == "r1"
    )
    assert metrics.count() == N_DOCS
    assert metrics.select("doc_id").distinct().count() == N_DOCS


def test_rerun_after_success_is_noop(spark, outputs):
    docs, _clean_dir, crash_dir = outputs
    summary = run_pipeline(spark, docs, crash_dir, run_id="r1",
                           num_buckets=BUCKETS, waves=WAVES, resume=True)
    assert summary["waves_run"] == 0  # all buckets in lineage -> nothing to do


def test_run_metrics_summary_reconciles(spark, outputs):
    from pdf_extractor_spark.pipeline import run_metrics_summary

    _docs, clean_dir, _crash_dir = outputs
    summ = run_metrics_summary(
        spark, os.path.join(clean_dir, "metrics"), "clean"
    ).collect()
    # label counts reconcile with the corpus: every doc in exactly one line
    assert sum(r.n_docs for r in summ) == N_DOCS
    assert all(r.n_success <= r.n_docs for r in summ)
    # spans/pages totals match the per-doc lineage sums
    m = spark.read.parquet(os.path.join(clean_dir, "metrics")).filter(
        F.col("run_id") == "clean"
    )
    assert sum(r.spans_emitted for r in summ) == (
        m.agg(F.sum("spans_emitted")).collect()[0][0]
    )
    assert sum(r.pages_parsed for r in summ) == (
        m.agg(F.sum("pages_parsed")).collect()[0][0]
    )
