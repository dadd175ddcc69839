"""spark-submit entry point for the span-sequence regression diff between
two extraction runs (the north-rule invariant as a batch job).

    spark-submit --py-files dist/pdf_extractor_spark.zip jobs/run_regression.py \
        --run-a /path/to/runA --run-b /path/to/runB --output /path/to/diff \
        [--format parquet|table] [--fail-threshold 0.0]

Reads two (doc_id, spans) corpora, writes the per-document diff
(doc_id, in_a, in_b, n_a, n_b, equal, first_diff) to --output, prints a
one-line JSON summary, and exits non-zero when the regression rate
exceeds --fail-threshold — CI-able: a nightly engine build diffs its
output against the blessed run and the job itself is the gate.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--run-a", required=True, help="blessed run (doc_id, spans)")
    ap.add_argument("--run-b", required=True, help="candidate run (doc_id, spans)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--format", choices=["parquet", "table"], default=None)
    ap.add_argument(
        "--fail-threshold",
        type=float,
        default=0.0,
        help="max tolerated fraction of non-equal documents (default: any "
        "divergence fails)",
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from pdf_extractor_spark.operators.spans import span_diff
    from pdf_extractor_spark.session import build_session, read_input

    spark = build_session("regression-job")
    a = read_input(spark, args.run_a, args.format)
    b = read_input(spark, args.run_b, args.format)
    diff = span_diff(a, b)
    diff.write.mode("overwrite").parquet(args.output)

    agg = (
        spark.read.parquet(args.output)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("equal").cast("int")).alias("n_equal"),
            F.sum((~F.col("in_a")).cast("int")).alias("n_only_b"),
            F.sum((~F.col("in_b")).cast("int")).alias("n_only_a"),
        )
        .collect()[0]
    )
    n_docs = agg["n_docs"] or 0
    n_equal = agg["n_equal"] or 0
    rate = 0.0 if n_docs == 0 else (n_docs - n_equal) / n_docs
    print(
        json.dumps(
            {
                "n_docs": n_docs,
                "n_equal": n_equal,
                "n_only_a": agg["n_only_a"] or 0,
                "n_only_b": agg["n_only_b"] or 0,
                "regression_rate": round(rate, 6),
                "fail_threshold": args.fail_threshold,
                "pass": rate <= args.fail_threshold,
            }
        )
    )
    spark.stop()
    if rate > args.fail_threshold:
        sys.exit(1)


if __name__ == "__main__":
    main()
