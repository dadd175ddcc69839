"""Stream-static enrichment: the standard "join the live event stream
against a slowly-changing dimension" pattern, plus a derived streaming
quality gate.

The static side is re-read PER MICRO-BATCH by Structured Streaming's
stream-static join semantics, so a dimension refreshed in place (e.g. an
hourly-rebuilt user-tier table) is picked up without restarting the query
— that is the operational point of the pattern at ingest scale, where the
dimension is a compact rollup (users, hosts) while the stream is the
10^12-row side. The join is a plain equi-join on the stream's key: each
micro-batch plans it like a batch join (broadcast when the dimension
fits, shuffle otherwise), and no state is kept — stream-static joins are
stateless by definition, which is why this composes freely with
watermarks and downstream stateful stages.

No reference counterpart (the reference is batch-only; SURVEY §2.8):
streaming support for the analytics family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def user_tier_dimension(history: DataFrame) -> DataFrame:
    """Static dimension from an event-history table: per-user lifetime
    purchase total and a spend tier (gold >= 500, silver >= 100, else
    bronze). The compact rollup the stream joins against."""
    return (
        history.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.round(F.sum("value"), 6).alias("lifetime_value"))
        .withColumn(
            "tier",
            F.when(F.col("lifetime_value") >= 500, "gold")
            .when(F.col("lifetime_value") >= 100, "silver")
            .otherwise("bronze"),
        )
    )


def enrich_stream(events_stream: DataFrame, dim: DataFrame) -> DataFrame:
    """stream(event_id, ts, user_id, event_type, value) ⋈ static dim ->
    stream with (lifetime_value, tier), left join so unknown users pass
    through with tier 'new'. Stateless; per-batch the dimension is
    re-planned (broadcast when small)."""
    return (
        events_stream.join(dim, "user_id", "left")
        .withColumn("tier", F.coalesce("tier", F.lit("new")))
        .withColumn(
            "lifetime_value", F.coalesce("lifetime_value", F.lit(0.0))
        )
    )
