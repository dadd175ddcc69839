"""spark-submit entry point for the corpus deduplication job: pair
detection (exact digest / MinHash-LSH+verify / SimHash blocking) ->
connected components -> survivor selection -> deduplicated corpus.

    spark-submit --py-files dist/pdf_extractor_spark.zip jobs/run_dedup.py \
        --input /path/to/documents.parquet --output /path/to/out \
        [--strategy minhash|exact|simhash] [--threshold 0.7] \
        [--max-bucket 10000] [--max-df 1000]

Writes under --output:
    survivors/   the deduplicated corpus (input schema preserved)
    clusters/    (doc_id, cluster) for every document
    pairs/       the detected near-dup pair list with its score column
and prints one JSON stats line (docs in/out, pairs, clusters).

Unlike extraction/curation, dedup is NOT doc-local — pair detection and
component propagation are global joins — so this job commits its outputs
atomically per directory (overwrite) rather than through the per-bucket
wave checkpoints of run_pipeline: re-running it is idempotent because
every stage is deterministic (seed-fixed hash families), but there is no
meaningful mid-job resume point to expose.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument(
        "--format", choices=["parquet", "table"], default=None,
        help="explicit input kind; default: infer like run_extract",
    )
    ap.add_argument("--output", required=True)
    ap.add_argument(
        "--strategy", choices=["exact", "minhash", "simhash"],
        default="minhash",
    )
    ap.add_argument("--threshold", type=float, default=0.7)
    ap.add_argument("--max-hamming", type=int, default=3)
    ap.add_argument("--max-bucket", type=int, default=10_000)
    ap.add_argument(
        "--oversize", choices=["drop", "star"], default="star",
        help="oversized-bucket policy (minhash): 'star' keeps duplicate "
        "classes connected with O(sz) verified edges; 'drop' removes them "
        "(the pair-list-completeness-only contract)",
    )
    ap.add_argument("--max-df", type=int, default=1000)
    ap.add_argument(
        "--write-index", action="store_true",
        help="also write index_buckets/ — the banded (band, bucket, "
        "doc_id) signature index over the survivors, the persisted probe "
        "artifact daily incremental dedup appends to",
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from pdf_extractor_spark.operators.curation import (
        dedup_apply,
        dedup_survivors,
    )
    from pdf_extractor_spark.operators.dedup import (
        exact_dedup,
        minhash_lsh_pairs,
        neardup_clusters,
        simhash_neardup_pairs,
    )
    from pdf_extractor_spark.session import build_session

    spark = build_session("dedup-job")
    from pdf_extractor_spark.session import read_input

    docs = read_input(spark, args.input, args.format)

    if args.strategy == "exact":
        groups = exact_dedup(docs)
        keep = groups.select(F.col("canonical_id").alias("doc_id"))
        survivors = docs.join(keep, "doc_id", "left_semi")
        pairs = groups.filter(F.col("n_dups") > 1).select(
            F.col("canonical_id").alias("id1"),
            F.col("digest").alias("id2_digest"),
            F.col("n_dups"),
        )
        clusters = None
    else:
        if args.strategy == "minhash":
            pairs = minhash_lsh_pairs(
                docs,
                threshold=args.threshold,
                max_bucket=args.max_bucket,
                oversize=args.oversize,
            )
        else:
            pairs = simhash_neardup_pairs(
                docs, max_hamming=args.max_hamming, max_bucket=args.max_bucket
            )
        clusters = neardup_clusters(docs, pairs).select(
            F.col("id").alias("doc_id"), "cluster"
        )
        sized = docs.withColumn("n_chars", F.length("text"))
        surv = dedup_survivors(sized, clusters)
        survivors = dedup_apply(docs, clusters, surv)

    pairs.write.mode("overwrite").parquet(f"{args.output}/pairs")
    if clusters is not None:
        clusters.write.mode("overwrite").parquet(f"{args.output}/clusters")
    survivors.write.mode("overwrite").parquet(f"{args.output}/survivors")

    if args.write_index:
        # the persisted probe artifact for daily increments: banded
        # (band, bucket, doc_id) rows over the SURVIVOR set (probing
        # against dropped members would resurrect their duplicate
        # classes). incremental_minhash_pairs / streaming_lsh_dedup read
        # the survivor corpus as their `index` side; this table is the
        # precomputed bucket half a production pipeline appends to daily
        # instead of re-signing the whole history.
        from pdf_extractor_spark.operators.dedup import (
            _banded_buckets,
            minhash_signatures,
        )

        sigs = minhash_signatures(survivors).filter(F.col("sig").isNotNull())
        _banded_buckets(sigs, bands=16, rows_per_band=4).select(
            "band", "bucket", F.col("id").alias("doc_id")
        ).write.mode("overwrite").parquet(f"{args.output}/index_buckets")

    stats = {
        "strategy": args.strategy,
        "docs_in": docs.count(),
        "docs_out": spark.read.parquet(f"{args.output}/survivors").count(),
        "pairs": spark.read.parquet(f"{args.output}/pairs").count(),
    }
    if args.write_index:
        stats["index_buckets"] = spark.read.parquet(
            f"{args.output}/index_buckets"
        ).count()
    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
