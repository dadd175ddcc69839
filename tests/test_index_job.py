"""jobs/run_index.py end-to-end: every persisted index artifact loads and
actually serves its consumer operator."""

import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.001"


def test_run_index_job_artifacts_serve_consumers(spark, tmp_path):
    out = str(tmp_path / "index")
    env = dict(os.environ, PYTHONPATH=REPO)
    proc = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "jobs", "run_index.py"),
            "--documents", os.path.join(SF, "documents.parquet"),
            "--embeddings", os.path.join(SF, "embeddings.parquet"),
            "--output", out,
        ],
        capture_output=True, text=True, env=env, timeout=540,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    manifest = json.loads(proc.stdout.strip().splitlines()[-1])
    assert manifest["bpe_rules"] == 3
    assert manifest["ivf_centroids"] == 16
    assert os.path.exists(os.path.join(out, "manifest.json"))

    from pyspark.sql import functions as F

    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))

    # digest index serves incremental exact dedup: probing the corpus
    # against its own index marks EVERY doc as already ingested
    idx = spark.read.parquet(os.path.join(out, "digest_index"))
    batch = docs.select(
        F.md5(F.coalesce("text", F.lit(""))).alias("digest"), "doc_id"
    )
    fresh = batch.join(idx.select("digest"), "digest", "left_anti")
    assert fresh.count() == 0

    # minhash bucket index serves the incremental LSH probe
    from pdf_extractor_spark.operators.dedup import incremental_minhash_pairs

    buckets = spark.read.parquet(os.path.join(out, "minhash_buckets"))
    assert manifest["minhash_bucket_rows"] == buckets.count() > 0
    pairs = incremental_minhash_pairs(
        docs, docs, index_buckets=buckets, threshold=0.7
    )
    assert pairs.count() >= 0  # runs end-to-end against the artifact

    # persisted verified pairs == inline recomputation (the artifact the
    # corpus-health reports consume instead of re-running signatures)
    from pdf_extractor_spark.operators.dedup import minhash_lsh_pairs

    persisted = spark.read.parquet(os.path.join(out, "neardup_pairs"))
    assert manifest["neardup_pair_rows"] == persisted.count()
    inline = minhash_lsh_pairs(docs, n=3, threshold=0.7)
    assert sorted(map(tuple, persisted.collect())) == sorted(
        map(tuple, inline.collect())
    )

    # persisted signatures serve minhash_lsh's signatures= fast path with
    # output identical to the inline signature build (neardup_pairs above
    # was built THROUGH the artifact, so this pins the direct consumer too)
    sig_df = spark.read.parquet(os.path.join(out, "minhash_signatures"))
    assert manifest["minhash_signature_rows"] == sig_df.count() > 0
    via_sigs = minhash_lsh_pairs(docs, n=3, threshold=0.7, signatures=sig_df)
    assert sorted(map(tuple, via_sigs.collect())) == sorted(
        map(tuple, inline.collect())
    )

    # persisted SimHash signatures serve simhash_neardup's fast path
    from pdf_extractor_spark.operators.dedup import simhash_neardup_pairs

    sh_df = spark.read.parquet(os.path.join(out, "simhash_signatures"))
    assert manifest["simhash_signature_rows"] == sh_df.count() > 0
    sh_art = simhash_neardup_pairs(docs, max_hamming=3, signatures=sh_df)
    sh_inline = simhash_neardup_pairs(docs, max_hamming=3)
    assert sorted(map(tuple, sh_art.collect())) == sorted(
        map(tuple, sh_inline.collect())
    )

    # BPE rules reproduce bpe_encode exactly (vs inline training)
    from pdf_extractor_spark.operators.curation import bpe_encode

    rules_rows = sorted(
        spark.read.parquet(os.path.join(out, "bpe_rules")).collect(),
        key=lambda r: r["step"],
    )
    rules = [(r["lhs"], r["rhs"]) for r in rules_rows]
    a = {r.doc_id: r.n_subwords for r in bpe_encode(docs, rules=rules).collect()}
    b = {r.doc_id: r.n_subwords for r in bpe_encode(docs, n_merges=3).collect()}
    assert a == b

    # the persisted per-word encoded table serves bpe_vocab's fast path:
    # the artifact rollup == the inline recomputation from the corpus
    from pdf_extractor_spark.operators.curation import bpe_vocab

    wp = spark.read.parquet(os.path.join(out, "bpe_word_pieces"))
    assert manifest["bpe_word_piece_rows"] == wp.count() > 0
    via_artifact = {
        r.symbol: r.freq for r in bpe_vocab(docs, word_pieces=wp).collect()
    }
    inline_vocab = {
        r.symbol: r.freq for r in bpe_vocab(docs, rules=rules).collect()
    }
    assert via_artifact == inline_vocab
    persisted_vocab = {
        r.symbol: r.freq
        for r in spark.read.parquet(os.path.join(out, "bpe_vocab")).collect()
    }
    assert persisted_vocab == inline_vocab

    # PQ artifacts serve the ADC scan: persisted codebooks + codes give
    # the same top-k as the inline build
    from pdf_extractor_spark.operators.similarity import (
        pq_adc_topk,
        pq_codebooks,
    )

    book_rows = spark.read.parquet(
        os.path.join(out, "pq_codebooks")
    ).collect()
    assert manifest["pq_codebooks"] == len(book_rows) > 0
    m = 1 + max(r.j for r in book_rows)
    books = [
        np.asarray(
            [r.cv for r in sorted(
                (r for r in book_rows if r.j == j), key=lambda r: r.cid
            )],
            dtype=np.float64,
        )
        for j in range(m)
    ]
    codes_df = spark.read.parquet(os.path.join(out, "pq_codes"))
    assert manifest["pq_code_rows"] == codes_df.count() > 0
    emb = spark.read.parquet(os.path.join(SF, "embeddings.parquet"))
    qv = emb.filter(F.col("vec_id") < 3).withColumnRenamed(
        "vec_id", "query_id"
    )
    via_artifact = pq_adc_topk(emb, qv, k=5, books=books, codes=codes_df)
    inline_pq = pq_adc_topk(emb, qv, k=5, books=pq_codebooks(emb))
    assert sorted(map(tuple, via_artifact.collect())) == sorted(
        map(tuple, inline_pq.collect())
    )

    # IVF centroids serve ivf_topk with self-match at rank 1
    from pdf_extractor_spark.operators.similarity import ivf_topk

    cent_rows = sorted(
        spark.read.parquet(os.path.join(out, "ivf_centroids")).collect(),
        key=lambda r: r["cid"],
    )
    cents = np.asarray([r.cv for r in cent_rows], dtype=np.float64)
    emb = spark.read.parquet(os.path.join(SF, "embeddings.parquet"))
    q = emb.filter(F.col("vec_id") < 3).withColumnRenamed("vec_id", "query_id")
    top = ivf_topk(emb, q, k=5, n_probe=8, centroids=cents)
    self_hits = top.filter(
        (F.col("query_id") == F.col("id")) & (F.col("rank") == 1)
    )
    assert self_hits.count() == 3

    # lattice artifacts: the persisted encoded-word table makes
    # lattice_encode(pieces=...) bit-identical to the inline Viterbi DP
    # (the recurring-query fast path that skips the DP recompile)
    from pdf_extractor_spark.operators.curation import lattice_encode

    lv_rows = spark.read.parquet(os.path.join(out, "lattice_vocab"))
    assert manifest["lattice_vocab_rows"] == lv_rows.count() > 0
    vocab = [
        (r["piece"], int(r["cnt"]))
        for r in sorted(
            lv_rows.collect(), key=lambda r: (-r["cnt"], r["piece"])
        )
    ]
    pieces = spark.read.parquet(os.path.join(out, "lattice_pieces"))
    assert manifest["lattice_piece_rows"] == pieces.count() > 0
    via_artifact = {
        r["doc_id"]: (r["n_words"], r["n_pieces"], r["piece_digest"])
        for r in lattice_encode(docs, vocab, pieces=pieces).collect()
    }
    inline = {
        r["doc_id"]: (r["n_words"], r["n_pieces"], r["piece_digest"])
        for r in lattice_encode(docs, vocab).collect()
    }
    assert via_artifact == inline
