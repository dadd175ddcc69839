"""Streaming quality gate with the TRAINED hashed-BoW model: score every
incoming document's margin against the persisted model artifact
(jobs/run_train.py hash_lr_weights + threshold) and route accept/reject —
the ingest-time form of the batch curation filter.

Model-in-stream shape: the weight vector rides the plan as a foldable
array literal (hash_lr_score), so scoring is a stateless narrow
projection — no state store, no Python worker, no join; the model
refreshes by restarting the query with the re-read artifact (models are
versioned artifacts, not mutable state). Margins are integer-valued
doubles (exact-integer trained weights), so stream and batch scoring
agree bit-for-bit — asserted by the batch-twin equality test
(tests/test_score_stream.py), the same twin discipline as every other
streaming operator here.

No reference counterpart (the reference is batch-only; SURVEY §2.8):
streaming support for the curation family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def score_stream(
    docs_stream: DataFrame,
    weights: list,
    threshold: float = 0.0,
    text_col: str = "text",
) -> DataFrame:
    """stream(doc_id, text, ...) -> + (margin, accept): the trained
    model applied per micro-batch. `accept` uses the trained
    LDA-midpoint threshold, not the raw sign."""
    from pdf_extractor_spark.operators.textstats import hash_lr_score

    scored = hash_lr_score(
        docs_stream,
        text_col=text_col,
        buckets=len(weights),
        weights=[float(w) for w in weights],
        binary=True,
        as_columns=True,
    )
    return (
        scored.withColumn("margin", F.col("lr_margin"))
        .withColumn("accept", F.col("lr_margin") > F.lit(float(threshold)))
        .drop("lr_margin", "lr_score", "lr_accept")
    )
