"""The plan-audit SinglePartition-sort/window invariant
(tools/plan_audit.single_partition_sortwin): the detector that keeps the
global-window anti-pattern — ALL rows of an unbounded input funneled
through ONE task's sort — from ever shipping unflagged again. It caught
stylometry_delta's vocabulary-sized marker window (fixed to
TakeOrderedAndProject) and zipf_fit's vocabulary row_number (fixed to
ranking.scalable_row_number); these tests pin both the detector's
semantics and the fixed plans.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import Window
from pyspark.sql import functions as F

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from tools.plan_audit import single_partition_sortwin  # noqa: E402


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_detects_global_window(spark):
    # the pre-fix stylometry/zipf shape: row_number over an
    # unpartitioned Window => Sort over Exchange SinglePartition
    df = spark.range(100).withColumn("x", F.col("id") % 7)
    bad = df.withColumn("r", F.row_number().over(Window.orderBy("x")))
    assert single_partition_sortwin(_plan(bad)) == ["Sort"]


def test_post_limit_window_not_flagged(spark):
    # the fix: orderBy().limit() compiles to TakeOrderedAndProject whose
    # output is already single-partition — a row_number over the <= k
    # surviving rows needs no exchange and must not flag
    df = spark.range(100).withColumn("x", F.col("id") % 7)
    ok = (
        df.orderBy("x", "id")
        .limit(5)
        .withColumn("r", F.row_number().over(Window.orderBy("x", "id")))
    )
    assert single_partition_sortwin(_plan(ok)) == []


def test_partitioned_window_not_flagged(spark):
    df = spark.range(100).withColumn("x", F.col("id") % 7)
    pw = df.withColumn(
        "r", F.row_number().over(Window.partitionBy("x").orderBy("id"))
    )
    assert single_partition_sortwin(_plan(pw)) == []


def test_global_orderby_not_flagged(spark):
    # a plain global sort range-partitions (Exchange rangepartitioning),
    # which parallelizes fine — only SinglePartition funnels flag
    df = spark.range(100).withColumn("x", F.col("id") % 7)
    assert single_partition_sortwin(_plan(df.orderBy("x"))) == []


def test_scalar_agg_single_partition_not_flagged(spark):
    # a global scalar aggregate also passes through Exchange
    # SinglePartition, but its consumer is a HashAggregate merging
    # partials — one row per partition, not the corpus — and must not
    # flag
    df = spark.range(100)
    assert single_partition_sortwin(_plan(df.agg(F.sum("id")))) == []


def test_stylometry_marker_selection_is_topk(spark):
    from pdf_extractor_spark.operators.stylometry import stylometry_delta

    docs = spark.createDataFrame(
        [(i, f"tok{i % 5} common word", f"src{i % 3}") for i in range(30)],
        "doc_id long, text string, source string",
    )
    plan = _plan(stylometry_delta(docs))
    assert single_partition_sortwin(plan) == []
    assert plan.count("TakeOrderedAndProject") >= 2


def test_zipf_rank_is_range_partitioned(spark):
    from pdf_extractor_spark.operators.textstats import zipf_fit

    docs = spark.createDataFrame(
        [(i, "a b c d e f g"[: 2 * (i % 7) + 1]) for i in range(40)],
        "doc_id long, text string",
    )
    plan = _plan(zipf_fit(docs))
    # the only SinglePartition sort left is the ranking.py bucket-offset
    # cumsum over the <= n_buckets(64)-row totals table
    hits = single_partition_sortwin(plan)
    assert len(hits) <= 1
