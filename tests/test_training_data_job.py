"""End-to-end test of the composed training-data job (jobs/
run_training_data.py): stage funnel monotonicity, pack-budget discipline,
shuffle-order determinism, and rerun idempotency by content."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F


def _run(spark, **kw):
    from jobs.run_training_data import build_training_data

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return build_training_data(docs, chunk_size=64, overlap=8,
                               pack_budget=256, **kw)


def test_training_data_funnel_and_packs(spark):
    out, stats = _run(spark)
    rows = out.collect()
    assert stats["docs_in"] >= stats["docs_kept"] >= stats["docs_after_dedup"] > 0
    assert len(rows) > stats["docs_after_dedup"] // 2  # chunking fans out

    # pack budget discipline: greedy first-fit-in-order means every pack's
    # token sum stays under budget + one max-chunk overshoot (the last
    # chunk that crossed the cut line)
    packs = (
        out.groupBy("shard", "pack_id")
        .agg(F.sum("n_chunk_tokens").alias("tok"))
        .collect()
    )
    assert all(p.tok <= 256 + 64 for p in packs)

    # shuffle order: positions are a permutation of 1..n
    pos = sorted(r.shuffle_pos for r in rows)
    assert pos == list(range(1, len(rows) + 1))


def test_training_data_rerun_identical(spark):
    a, _ = _run(spark)
    b, _ = _run(spark)
    ka = sorted(map(tuple, a.select("chunk_uid", "pack_id", "shuffle_pos").collect()))
    kb = sorted(map(tuple, b.select("chunk_uid", "pack_id", "shuffle_pos").collect()))
    assert ka == kb


def test_training_data_near_dedup_drops_more(spark):
    _, exact_stats = _run(spark)
    _, near_stats = _run(spark, near_dedup=True, threshold=0.7)
    assert near_stats["docs_after_dedup"] <= exact_stats["docs_after_dedup"]
    assert near_stats["docs_after_dedup"] > 0
