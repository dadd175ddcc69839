"""spark-submit entry point for the INDEX-BUILD job: every write-time
index artifact the engine's operators consume, persisted in one pass —
the operational form of the "index state is built once, at write time"
discipline that recurs across the operator docstrings (IVF centroids,
trained BPE rules, banded LSH signatures, eval Bloom filter).

    spark-submit --py-files dist/pdf_extractor_spark.zip \\
        jobs/run_index.py \\
        --documents /path/documents.parquet \\
        --embeddings /path/embeddings.parquet \\
        --output /path/index [--n-centroids 16] [--n-merges 3]

Writes under --output (each independently loadable):
    minhash_signatures/ (id, sig array<long>)  — minhash_lsh's
                      signatures= fast path skips the corpus shingle
                      explode + num_hashes-min aggregate
    simhash_signatures/ (id, simhash)          — simhash_neardup's
                      signatures= fast path skips the token explode +
                      60-balance aggregate
    minhash_buckets/  (band, bucket, doc_id)   — incremental_minhash_pairs
                      / streaming LSH probe read this as index_buckets
    neardup_pairs/    (id_a, id_b, jaccard)    — verified near-dup pairs;
                      cluster_size_hist / dedup_survivors / dedup_apply
                      consume these instead of recomputing signatures
    digest_index/     (digest, doc_id)         — incremental_dedup's
                      ingested-source digest index
    ivf_centroids/    (cid, cv array<double>)  — ivf_topk / semdedup /
                      kmeans_cluster_stats take these as `centroids`
    pq_codebooks/     (j, cid, cv)             — product-quantization
                      subspace codebooks (pq_adc_topk's index state)
    pq_codes/         (id, codes array<int>)   — 8-byte compressed
                      vectors pq_adc_topk / pq_rerank_topk scan via
                      codes=
    bpe_rules/        (step, lhs, rhs, pair_count) — bpe_encode/bpe_vocab
                      take [(lhs, rhs)] in step order
    bpe_word_pieces/  (w, wf, syms)            — per-word encoded table;
                      bpe_vocab's word_pieces= fast path rolls this up
    bpe_vocab/        (symbol, freq)           — coverage / OOV analyses
    manifest.json     row counts + parameters for resume/audit

Every artifact is deterministic for a fixed corpus (seeded hashes,
stride-seeded centroids, lexicographic merge tie-breaks), so rebuilding
is idempotent: rerunning overwrites byte-identical content.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--documents", required=True)
    ap.add_argument("--embeddings", default=None)
    ap.add_argument("--output", required=True)
    ap.add_argument("--n-centroids", type=int, default=16)
    ap.add_argument("--n-merges", type=int, default=3)
    ap.add_argument("--bands", type=int, default=16)
    ap.add_argument("--num-hashes", type=int, default=64)
    args = ap.parse_args()
    if args.num_hashes % args.bands != 0:
        # mirror the consumer's (incremental_minhash_pairs) invariant at
        # build time: a silently truncated signature would persist an
        # artifact the recorded (bands, num_hashes) can never reproduce.
        ap.error(
            f"--bands must divide --num-hashes "
            f"({args.num_hashes} % {args.bands} != 0)"
        )

    from pyspark.sql import functions as F

    from pdf_extractor_spark.operators.curation import (
        bpe_merges,
        bpe_vocab,
        bpe_word_pieces,
    )
    from pdf_extractor_spark.operators.dedup import (
        _banded_buckets,
        minhash_signatures,
    )
    from pdf_extractor_spark.session import build_session

    spark = build_session("index-build")
    docs = spark.read.parquet(args.documents)
    out = args.output
    manifest: dict = {
        "bands": args.bands,
        "num_hashes": args.num_hashes,
        "n_merges": args.n_merges,
    }

    # 1. exact-dedup digest index (incremental_dedup's probe side)
    digests = docs.select(
        F.md5(F.coalesce(F.col("text"), F.lit(""))).alias("digest"),
        "doc_id",
    )
    digests.write.mode("overwrite").parquet(f"{out}/digest_index")
    manifest["digest_index_rows"] = spark.read.parquet(
        f"{out}/digest_index"
    ).count()

    # 2. MinHash signatures + banded bucket index (LSH probe side).
    # Signatures are persisted in their own right: the full-corpus
    # minhash_lsh query takes them via signatures= and skips the
    # corpus-sized shingle explode + 64-min aggregate on every run.
    minhash_signatures(docs, num_hashes=args.num_hashes).filter(
        F.col("sig").isNotNull()
    ).write.mode("overwrite").parquet(f"{out}/minhash_signatures")
    sigs = spark.read.parquet(f"{out}/minhash_signatures")
    manifest["minhash_signature_rows"] = sigs.count()
    _banded_buckets(
        sigs, bands=args.bands, rows_per_band=args.num_hashes // args.bands
    ).select("band", "bucket", F.col("id").alias("doc_id")).write.mode(
        "overwrite"
    ).parquet(f"{out}/minhash_buckets")
    manifest["minhash_bucket_rows"] = spark.read.parquet(
        f"{out}/minhash_buckets"
    ).count()

    # 2a. SimHash signatures — simhash_neardup's signatures= fast path
    # (the token explode + 60-balance aggregate runs once, here)
    from pdf_extractor_spark.operators.dedup import simhash64

    simhash64(docs).write.mode("overwrite").parquet(
        f"{out}/simhash_signatures"
    )
    manifest["simhash_signature_rows"] = spark.read.parquet(
        f"{out}/simhash_signatures"
    ).count()

    # 2b. verified near-dup pairs (banded candidates -> exact-Jaccard
    # verify) — the artifact recurring corpus-health reports
    # (cluster_size_hist / dedup_survivors / dedup_apply) consume
    # instead of recomputing signatures + self-join per invocation
    from pdf_extractor_spark.operators.dedup import minhash_lsh_pairs

    minhash_lsh_pairs(
        docs, n=3, num_hashes=args.num_hashes, bands=args.bands,
        threshold=0.7, signatures=sigs,
    ).write.mode("overwrite").parquet(f"{out}/neardup_pairs")
    manifest["neardup_pair_rows"] = spark.read.parquet(
        f"{out}/neardup_pairs"
    ).count()

    # 3. trained BPE rules + the induced vocabulary
    rules_df = bpe_merges(docs, n_merges=args.n_merges)
    rules_df.write.mode("overwrite").parquet(f"{out}/bpe_rules")
    rules = [
        (r["lhs"], r["rhs"])
        for r in sorted(rules_df.collect(), key=lambda r: r["step"])
    ]
    bpe_word_pieces(docs, rules=rules).write.mode("overwrite").parquet(
        f"{out}/bpe_word_pieces"
    )
    wp = spark.read.parquet(f"{out}/bpe_word_pieces")
    bpe_vocab(docs, rules=rules, word_pieces=wp).write.mode(
        "overwrite"
    ).parquet(f"{out}/bpe_vocab")
    manifest["bpe_rules"] = len(rules)
    manifest["bpe_word_piece_rows"] = wp.count()
    manifest["bpe_vocab_rows"] = spark.read.parquet(
        f"{out}/bpe_vocab"
    ).count()

    # 3b. lattice tokenizer: piece vocabulary + the encoded distinct-word
    # table. The per-word Viterbi DP is the one genuinely
    # compile-expensive plan in the engine (unrolled max_word x max_piece
    # candidate/backpointer columns) — persisting (w, pieces, n_pieces)
    # turns every recurring lattice_encode into one word-key join.
    from pdf_extractor_spark.operators.curation import (
        _lattice_word_pieces,
        lattice_vocab,
        tokens_col,
    )

    lv_df = lattice_vocab(docs)
    lv_df.write.mode("overwrite").parquet(f"{out}/lattice_vocab")
    lv = [
        (r["piece"], int(r["cnt"]))
        for r in sorted(
            lv_df.collect(), key=lambda r: (-r["cnt"], r["piece"])
        )
    ]
    words = (
        docs.select(
            F.explode(tokens_col(F.lower(F.col("text")))).alias("w")
        )
        .distinct()
    )
    _lattice_word_pieces(words, lv).write.mode("overwrite").parquet(
        f"{out}/lattice_pieces"
    )
    manifest["lattice_vocab_rows"] = lv_df.count()
    manifest["lattice_piece_rows"] = spark.read.parquet(
        f"{out}/lattice_pieces"
    ).count()

    # 4. IVF coarse centroids over the embedding corpus
    if args.embeddings:
        import numpy as np  # noqa: F401 (ivf_centroids returns ndarray)

        from pdf_extractor_spark.operators.similarity import ivf_centroids

        emb = spark.read.parquet(args.embeddings)
        cents = ivf_centroids(emb, args.n_centroids)
        spark.createDataFrame(
            [(i, [float(x) for x in cents[i]]) for i in range(len(cents))],
            "cid int, cv array<double>",
        ).write.mode("overwrite").parquet(f"{out}/ivf_centroids")
        manifest["ivf_centroids"] = int(len(cents))

        # 4b. PQ codebooks + per-vector codes (the 8-byte compressed
        # representation pq_adc_topk / pq_rerank_topk scan)
        from pdf_extractor_spark.operators.similarity import (
            pq_codebooks,
            pq_encode,
        )

        books = pq_codebooks(emb)
        spark.createDataFrame(
            [
                (j, c, [float(x) for x in books[j][c]])
                for j in range(len(books))
                for c in range(books[j].shape[0])
            ],
            "j int, cid int, cv array<double>",
        ).write.mode("overwrite").parquet(f"{out}/pq_codebooks")
        pq_encode(emb, books).write.mode("overwrite").parquet(
            f"{out}/pq_codes"
        )
        manifest["pq_codebooks"] = int(
            sum(b.shape[0] for b in books)
        )
        manifest["pq_code_rows"] = spark.read.parquet(
            f"{out}/pq_codes"
        ).count()

    with open(os.path.join(out, "manifest.json"), "w") as f:
        json.dump(manifest, f, sort_keys=True)
    print(json.dumps(manifest, sort_keys=True))
    spark.stop()


if __name__ == "__main__":
    main()
