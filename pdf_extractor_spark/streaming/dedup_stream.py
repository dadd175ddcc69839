"""Stateful streaming dedup: first-seen filter across micro-batches via
applyInPandasWithState.

The training-data use case: document drops arrive continuously; a document
whose (normalized) text digest was already emitted in ANY earlier
micro-batch must not be emitted again.

Scale shape (round-2 redesign per round-1 advice): state is keyed by the
FULL digest, so each state value is a single marker row — per-batch state
work is O(rows in the batch), never O(total distinct digests ever seen).
Round 1 kept one sorted digest LIST per 256-way prefix bucket and rewrote
the whole list every micro-batch, which grows linearly with history; with
per-digest keys the state store (RocksDB provider in production) only
touches the keys present in the batch.

Total state size still grows with the number of DISTINCT digests — that is
inherent to exact first-seen semantics. Two bounding options, both real:
`ttl_minutes` drops markers idle longer than the TTL (state then means
"seen within the TTL window" — standard watermark-style bounding), or run
periodic batch exact_dedup compaction and reset the stream's checkpoint.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("digest", T.StringType()),
    ]
)

STATE_SCHEMA = T.StructType([T.StructField("seen", T.BooleanType())])


def _first_seen_factory(ttl_minutes: "int | None"):
    def _first_seen(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # TTL expired with no new arrivals: drop the marker
            state.remove()
            yield pd.DataFrame({"doc_id": [], "digest": []})
            return
        first_id = None
        for pdf in pdfs:
            if len(pdf) and first_id is None:
                # deterministic pick among same-batch duplicates
                first_id = pdf["doc_id"].min()
        already = state.exists
        if not already:
            state.update((True,))
        if ttl_minutes is not None:
            state.setTimeoutDuration(ttl_minutes * 60 * 1000)
        if already or first_id is None:
            yield pd.DataFrame({"doc_id": [], "digest": []})
        else:
            yield pd.DataFrame({"doc_id": [first_id], "digest": [key[0]]})

    return _first_seen


def streaming_first_seen(
    docs_stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ttl_minutes: "int | None" = None,
) -> DataFrame:
    """stream(doc_id, text) -> stream(doc_id, digest) with only the FIRST
    occurrence of each text digest ever emitted (within ttl_minutes, if
    set). State keyed by the full digest: per-key state is one boolean
    marker, the groupBy shuffle partitions by digest hash (uniform, no
    skew), and per-batch state I/O is proportional to the batch."""
    keyed = docs_stream.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.md5(F.col(text_col)).alias("digest"),
    )
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_minutes is not None
        else GroupStateTimeout.NoTimeout
    )
    return keyed.groupBy("digest").applyInPandasWithState(
        _first_seen_factory(ttl_minutes),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
