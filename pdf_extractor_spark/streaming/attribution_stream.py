"""Watermarked stream-stream join: click -> purchase attribution.

The remaining core Structured Streaming pattern after the stateless
pipeline (extract_stream), windowed aggregation (metrics_stream), and the
two applyInPandasWithState operators (dedup_stream, session_stream): an
INNER JOIN of two live streams. A purchase is attributed to every click by
the same user within the preceding `attribution_minutes` — the classic ad
attribution / conversion shape, and in a training-data pipeline the same
join matches late-arriving media blobs to their document manifests.

Streaming-legal by construction: both sides carry an event-time watermark
AND the join predicate bounds purchase_ts to a finite interval after
click_ts, which is exactly what Spark's state cleanup needs — a buffered
click can be dropped once the purchase watermark passes
click_ts + attribution window, a buffered purchase once the click
watermark passes purchase_ts. Without the time-range predicate the state
store would hold both streams forever.

Scale: the join shuffles both streams by user_id hash into co-located
state-store partitions; per-batch work is O(batch), total state is
O(events inside one watermark horizon) per side — independent of stream
history. Skewed power-users bound the per-key buffer by the time range,
not by history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attributed_purchases(
    clicks: DataFrame,
    purchases: DataFrame,
    attribution_minutes: int = 30,
    watermark: str = "1 hour",
) -> DataFrame:
    """(user_id, click_ts, purchase_ts, value) — one row per (click,
    purchase) pair of the same user with
    click_ts <= purchase_ts <= click_ts + attribution_minutes.

    `clicks` needs (user_id, click_ts); `purchases` needs
    (user_id, purchase_ts, value). Both may be streaming DataFrames; the
    watermark is applied here so callers pass raw streams."""
    c = clicks.select("user_id", "click_ts").withWatermark(
        "click_ts", watermark
    )
    p = purchases.select(
        F.col("user_id").alias("p_user_id"), "purchase_ts", "value"
    ).withWatermark("purchase_ts", watermark)
    cond = (
        (c.user_id == p.p_user_id)
        & (p.purchase_ts >= c.click_ts)
        & (
            p.purchase_ts
            <= c.click_ts + F.expr(f"INTERVAL {attribution_minutes} MINUTES")
        )
    )
    return c.join(p, cond).select(
        "user_id", "click_ts", "purchase_ts", "value"
    )


def split_event_streams(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split the analytics event stream (ts, user_id, event_type, value)
    into the (clicks, purchases) pair attributed_purchases expects. Two
    filters over one source stream — Spark runs them as two narrow branches
    of the same scan, no duplication of the source."""
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("purchase_ts"), "value"
    )
    return clicks, purchases
