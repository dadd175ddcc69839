"""Streaming near-dup gate: each arriving micro-batch is probed against a
STATIC MinHash-LSH signature index and near-duplicate arrivals are
suppressed — the continuous-ingest twin of
operators.dedup.incremental_minhash_pairs (which is the batch/daily form).

Shape: foreachBatch. Stream-side signatures/buckets are per-row narrow
work, but the probe itself is a join followed by an exact-Jaccard verify —
multi-stage batch logic that Structured Streaming's incremental planner
can't express natively — so each micro-batch runs the BATCH operator
against the broadcast-or-shuffled static index and writes survivors. This
is the standard production pattern (foreachBatch = "reuse the batch
operator per micro-batch") and keeps ONE implementation of the probe
semantics: the streaming path cannot drift from the oracled batch path.

State: none in the stream (the index is the state, managed outside the
query as a table the daily batch job appends to). foreachBatch is
at-least-once — a failure between the sink write and the checkpoint
commit replays the micro-batch — so the sink writes each epoch to its own
`batch_id=N` partition directory with overwrite: a replay rewrites the
same directory byte-identically instead of appending duplicates, which is
the standard idempotent-foreachBatch recipe. Readers see batch_id as a
discovered partition column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_lsh_dedup(
    stream: DataFrame,
    index: DataFrame,
    sink_path: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    max_bucket: "int | None" = 10_000,
):
    """Start a foreachBatch query that writes, per micro-batch, the
    arriving documents that are NOT near-duplicates of the static index
    (exact shingle Jaccard >= threshold after the LSH probe). Returns the
    StreamingQuery."""
    from ..operators.dedup import incremental_minhash_pairs

    def _probe(batch: DataFrame, batch_id: int) -> None:
        pairs = incremental_minhash_pairs(
            batch,
            index,
            text_col=text_col,
            id_col=id_col,
            threshold=threshold,
            max_bucket=max_bucket,
        )
        dup_ids = pairs.select(
            F.col("batch_id").alias("_dup")
        ).distinct()
        fresh = batch.join(
            dup_ids, F.col(id_col) == F.col("_dup"), "left_anti"
        )
        # idempotent per-epoch commit: overwrite THIS batch's partition
        # directory, so an at-least-once replay rewrites rather than
        # duplicates (foreachBatch gives no transaction log of its own)
        fresh.write.mode("overwrite").parquet(
            f"{sink_path}/batch_id={batch_id}"
        )

    return (
        stream.writeStream.foreachBatch(_probe)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
