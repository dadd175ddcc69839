"""spark-submit entry point for the extraction job.

    spark-submit --py-files dist/pdf_extractor_spark.zip jobs/run_extract.py \
        --input /path/to/documents --output /path/to/out \
        [--run-id r1] [--buckets 64] [--salts 8] [--waves 4] [--no-resume]

On a cluster the session comes from spark-submit's conf (master, executors);
build_session only fills in the engine's tuning defaults (AQE, Arrow batch
bound, dynamic partition overwrite, ParallelGC).
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument(
        "--format",
        choices=["parquet", "table"],
        default=None,
        help="explicit input kind: 'table' = catalog/temp-view name (incl. "
        "single-part default-namespace names), 'parquet' = path. Default: "
        "infer — dotted slash-free names read as tables, anything else as "
        "a parquet path.",
    )
    ap.add_argument(
        "--input-kind",
        choices=["spans", "documents"],
        default="spans",
        help="'spans' = the engine's native (doc_id, spans) corpus; "
        "'documents' = a flat (doc_id, text, ...) table, converted to a "
        "spans corpus on the fly (sources.corpus.corpus_from_documents_table)",
    )
    ap.add_argument("--output", required=True)
    ap.add_argument("--run-id", default="run-0")
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--salts", type=int, default=8)
    ap.add_argument("--waves", type=int, default=1)
    ap.add_argument("--no-resume", action="store_true")
    args = ap.parse_args()

    from pdf_extractor_spark.pipeline import run_pipeline
    from pdf_extractor_spark.session import build_session

    spark = build_session("extract-job")
    from pdf_extractor_spark.session import read_input

    docs = read_input(spark, args.input, args.format)
    if args.input_kind == "documents":
        from pdf_extractor_spark.sources.corpus import corpus_from_documents_table

        docs = corpus_from_documents_table(docs)
    summary = run_pipeline(
        spark,
        docs,
        args.output,
        run_id=args.run_id,
        num_buckets=args.buckets,
        salts=args.salts,
        waves=args.waves,
        resume=not args.no_resume,
    )
    print(summary)
    # run-level extraction metrics (north_star: classifier label counts,
    # pages parsed, spans emitted) — one aggregate over the lineage table
    from pdf_extractor_spark.pipeline import run_metrics_summary

    for r in run_metrics_summary(
        spark, summary["metrics_path"], args.run_id
    ).collect():
        print(
            f"[labels] {r.doc_type}: docs={r.n_docs} success={r.n_success} "
            f"pages={r.pages_parsed} spans={r.spans_emitted}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
