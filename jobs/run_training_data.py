"""spark-submit entry point for the end-to-end training-data job: the
full corpus -> training-shards pipeline composed from the engine's
curation/dedup/chunking operators.

    spark-submit --py-files dist/pdf_extractor_spark.zip \\
        jobs/run_training_data.py \\
        --input /path/to/documents.parquet --output /path/to/out \\
        [--chunk-size 2048] [--overlap 128] [--pack-budget 2048] \\
        [--near-dedup] [--threshold 0.7] [--seed shuf1]

Stages (each an existing, individually-oracled operator):

  1. quality   — curation_transform: Gopher rules + hashed-LR classifier
                 + text digest; drop keep=false docs (doc-local, narrow).
  2. dedup     — exact: keep the min-doc_id survivor per digest (one
                 digest-key shuffle). With --near-dedup, additionally
                 MinHash-LSH pairs -> connected components -> survivor
                 selection -> anti-join (run_dedup's chain, star-mode
                 oversized buckets).
  3. chunk     — chunk_documents: fixed-token windows with overlap,
                 zero-shuffle explode.
  4. pack      — pack_sequences: greedy in-order binning into ~budget-token
                 packs per hash shard (window-per-shard, never global).
  5. order     — global_shuffle: deterministic md5-seeded training order
                 (256-way sharded two-level positions, no corpus-wide
                 window). Consumers read ORDER BY shuffle_pos.

Writes under --output:
    chunks/   (chunk_uid, doc_id, chunk_id, n_chunk_tokens, chunk_text,
               shard, pack_id, shuffle_pos)
and prints ONE JSON stats line (docs in / kept / deduped, chunks, packs).

Every stage is deterministic (seed-fixed hash families), so re-running
overwrites with identical content — the same idempotency contract as
run_dedup. Per-bucket mid-job resume applies only to the doc-local
stage 1 (run it standalone via run_curation.py when that matters);
stages 2-5 are global joins/windows with no meaningful resume point.
"""

from __future__ import annotations

import argparse
import json


def build_training_data(
    docs,
    chunk_size: int = 2048,
    overlap: int = 128,
    pack_budget: int = 2048,
    near_dedup: bool = False,
    threshold: float = 0.7,
    max_bucket: int = 10_000,
    seed: str = "shuf1",
):
    """The composed pipeline as a library function (the job's testable
    core): docs -> (chunks DataFrame, stats dict). The two stage frames
    every later stage re-reads (quality survivors, dedup survivors) are
    persisted so the funnel counts and the downstream chunk/pack/shuffle
    chain never replay the curation or pair-detection work; the caller
    owns the returned frame's lifetime (unpersist happens on session
    end — these are job-scoped)."""
    from pyspark.sql import functions as F

    from pdf_extractor_spark.operators.curation import (
        curation_transform,
        dedup_apply,
        dedup_survivors,
        global_shuffle,
    )
    from pdf_extractor_spark.operators.dedup import (
        minhash_lsh_pairs,
        neardup_clusters,
    )
    from pdf_extractor_spark.operators.textstats import (
        chunk_documents,
        pack_sequences,
    )

    n_in = docs.count()

    kept = curation_transform(docs).filter(F.col("keep")).persist()
    n_kept = kept.count()

    # exact dedup: min-doc_id survivor per digest, one digest-key shuffle
    # (the shuffle moves 32-byte digests + ids, never text)
    first = kept.groupBy("digest").agg(F.min("doc_id").alias("_surv"))
    deduped = kept.join(
        first,
        (kept["digest"] == first["digest"])
        & (kept["doc_id"] == first["_surv"]),
        "left_semi",
    )

    if near_dedup:
        pairs = minhash_lsh_pairs(
            deduped,
            threshold=threshold,
            max_bucket=max_bucket,
            oversize="star",
        )
        clusters = neardup_clusters(deduped, pairs).select(
            F.col("id").alias("doc_id"), "cluster"
        )
        sized = deduped.withColumn("n_chars", F.length("text"))
        survivors = dedup_survivors(sized, clusters)
        deduped = dedup_apply(deduped, clusters, survivors)
    deduped = deduped.persist()
    n_dedup = deduped.count()
    kept.unpersist()

    chunks = chunk_documents(
        deduped, chunk_size=chunk_size, overlap=overlap
    ).withColumn(
        "chunk_uid",
        F.concat_ws("_", F.col("doc_id").cast("string"), "chunk_id"),
    )
    packed = pack_sequences(
        chunks,
        budget=pack_budget,
        count_col="n_chunk_tokens",
        id_col="chunk_uid",
    )
    order = global_shuffle(packed, seed=seed, id_col="chunk_uid").select(
        "chunk_uid", F.col("shuffle_pos")
    )
    out = packed.join(order, "chunk_uid")

    stats = {
        "docs_in": n_in,
        "docs_kept": n_kept,
        "docs_after_dedup": n_dedup,
    }
    return out, stats


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument(
        "--format", choices=["parquet", "table"], default=None,
        help="explicit input kind; default: infer like run_extract",
    )
    ap.add_argument("--output", required=True)
    ap.add_argument("--chunk-size", type=int, default=2048)
    ap.add_argument("--overlap", type=int, default=128)
    ap.add_argument("--pack-budget", type=int, default=2048)
    ap.add_argument("--near-dedup", action="store_true")
    ap.add_argument("--threshold", type=float, default=0.7)
    ap.add_argument("--max-bucket", type=int, default=10_000)
    ap.add_argument("--seed", default="shuf1")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from pdf_extractor_spark.session import build_session

    spark = build_session("training-data-job")
    docs = read_input(spark, args.input, args.format)
    out, stats = build_training_data(
        docs,
        chunk_size=args.chunk_size,
        overlap=args.overlap,
        pack_budget=args.pack_budget,
        near_dedup=args.near_dedup,
        threshold=args.threshold,
        max_bucket=args.max_bucket,
        seed=args.seed,
    )
    out.write.mode("overwrite").parquet(f"{args.output}/chunks")
    written = spark.read.parquet(f"{args.output}/chunks")
    stats["chunks"] = written.count()
    stats["packs"] = written.select("shard", "pack_id").distinct().count()
    stats["tokens"] = written.agg(
        F.sum("n_chunk_tokens").cast("long")
    ).collect()[0][0]
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
