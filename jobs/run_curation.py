"""spark-submit entry point for the corpus-curation annotation job:
Gopher quality rules + hashed-LR classifier + digest, written per-bucket
with the same checkpoint/resume/lineage machinery as the extraction job.

    spark-submit --py-files dist/pdf_extractor_spark.zip jobs/run_curation.py \
        --input /path/to/documents.parquet --output /path/to/out \
        [--run-id c1] [--buckets 64] [--salts 8] [--waves 4] [--no-resume]

Downstream dedup (exact or near) consumes the emitted `digest`/`keep`
columns; this job itself is doc-local and therefore bucket-idempotent.
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument(
        "--format", choices=["parquet", "table"], default=None,
        help="explicit input kind; default: infer like run_extract",
    )
    ap.add_argument("--output", required=True)
    ap.add_argument("--run-id", default="cur-0")
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--salts", type=int, default=8)
    ap.add_argument("--waves", type=int, default=1)
    ap.add_argument("--no-resume", action="store_true")
    args = ap.parse_args()

    from pdf_extractor_spark.operators.curation import (
        curation_metrics,
        curation_transform,
    )
    from pdf_extractor_spark.pipeline import run_pipeline
    from pdf_extractor_spark.session import build_session

    spark = build_session("curation-job")
    from pdf_extractor_spark.session import read_input

    docs = read_input(spark, args.input, args.format)
    summary = run_pipeline(
        spark,
        docs,
        args.output,
        run_id=args.run_id,
        num_buckets=args.buckets,
        salts=args.salts,
        waves=args.waves,
        resume=not args.no_resume,
        transform=curation_transform,
        metrics_fn=curation_metrics,
    )
    print(summary)
    spark.stop()


if __name__ == "__main__":
    main()
