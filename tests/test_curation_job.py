"""Checkpoint/resume idempotency for the generalized pipeline running the
curation transform (jobs/run_curation.py path): crash after wave 0, resume,
final table byte-identical to an uninterrupted run, exactly one lineage row
per document."""

import os

import pytest
from pyspark.sql import functions as F

from pdf_extractor_spark.operators.curation import (
    curation_metrics,
    curation_transform,
)
from pdf_extractor_spark.pipeline import run_pipeline

BUCKETS = 8
WAVES = 4


def _docs(spark):
    rows = [
        (i, f"the quick doc {i} " + ("spam " * (i % 7)) + "and more words here",
         "en" if i % 3 else "pt", f"src{i % 4}")
        for i in range(150)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )


def _run(spark, docs, out, run_id, **kw):
    return run_pipeline(
        spark, docs, out, run_id=run_id, num_buckets=BUCKETS, waves=WAVES,
        transform=curation_transform, metrics_fn=curation_metrics, **kw
    )


def _canon(spark, d):
    df = spark.read.parquet(os.path.join(d, "extracted"))
    cols = [c for c in sorted(df.columns)]
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_curation_job_crash_resume_idempotent(spark, tmp_path):
    docs = _docs(spark)
    clean, crash = str(tmp_path / "clean"), str(tmp_path / "crash")

    _run(spark, docs, clean, "clean")
    with pytest.raises(RuntimeError, match="simulated failure"):
        _run(spark, docs, crash, "r1", fail_after_wave=0)

    m = spark.read.parquet(os.path.join(crash, "metrics"))
    assert 0 < m.select("partition_id").distinct().count() < BUCKETS

    resumed = _run(spark, docs, crash, "r1")
    assert resumed["waves_run"] < WAVES  # some waves skipped via lineage

    assert _canon(spark, crash) == _canon(spark, clean)
    m2 = spark.read.parquet(os.path.join(crash, "metrics"))
    assert m2.count() == 150
    assert m2.select("doc_id").distinct().count() == 150
    # the annotation columns landed
    ex = spark.read.parquet(os.path.join(crash, "extracted"))
    for c in ("accept", "lr_accept", "keep", "digest", "lr_score"):
        assert c in ex.columns
    assert ex.filter(F.col("keep")).count() > 0
