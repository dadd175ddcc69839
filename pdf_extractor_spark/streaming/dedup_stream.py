"""Stateful streaming dedup: first-seen filter across micro-batches via
applyInPandasWithState.

The training-data use case: document drops arrive continuously; a document
whose (normalized) text digest was already emitted in ANY earlier
micro-batch must not be emitted again. The seen-set lives in the state
store, keyed by digest bucket — bounded per key, checkpointed, and restored
across restarts (exactly the lifecycle the batch pipeline's lineage table
provides for resumable runs, but push-based).

Scale shape: state is keyed by a digest PREFIX bucket (configurable width),
so the per-key state value is the list of full digests in that bucket —
state partitioning matches the shuffle partitioning, skew is bounded by the
uniformity of the hash.
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

STATE_SCHEMA = T.StructType(
    [T.StructField("seen", T.ArrayType(T.StringType()))]
)


def _first_seen(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    seen = set(state.get[0]) if state.exists else set()
    out_ids, out_digests = [], []
    for pdf in pdfs:
        for did, digest in zip(pdf["doc_id"], pdf["digest"]):
            if digest not in seen:
                seen.add(digest)
                out_ids.append(did)
                out_digests.append(digest)
    state.update((sorted(seen),))
    yield pd.DataFrame({"doc_id": out_ids, "digest": out_digests})


def streaming_first_seen(
    docs_stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bucket_prefix_len: int = 2,
) -> DataFrame:
    """stream(doc_id, text) -> stream(doc_id, digest) with only the FIRST
    occurrence of each text digest ever emitted. State keyed by digest
    prefix bucket (256 buckets at len 2 -> state co-partitioned with the
    groupBy shuffle)."""
    keyed = docs_stream.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.md5(F.col(text_col)).alias("digest"),
    ).withColumn("bucket", F.substring("digest", 1, bucket_prefix_len))
    return keyed.groupBy("bucket").applyInPandasWithState(
        _first_seen,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
