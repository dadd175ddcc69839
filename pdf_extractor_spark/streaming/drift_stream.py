"""Streaming drift monitoring: watermarked windowed bin counts against a
static reference binning.

The streaming half of the psi_drift monitor: the batch op learns the
reference decile edges once (index state, like IVF centroids); the stream
assigns every arriving value to its reference bin and maintains
watermark-finalized per-(window, bin) counts. PSI itself is a 10-row
reduction per window — computed wherever the counts land (dashboard,
foreachBatch, or the batch op over the sink), so the STREAM only carries
the mergeable part, which is what makes the monitor resumable and
backfill-consistent: counts are additive, PSI is not.

Watermark semantics: 10-minute tumbling windows, 5-minute allowed
lateness; a window's counts are emitted once, when the watermark passes
its end (append mode), so the sink never holds partial rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def reference_edges(history: DataFrame, n_bins: int = 10) -> list:
    """Learn the reference bin edges (interpolated percentiles of the
    historical value distribution). Bounded driver state: n_bins - 1
    floats — index state, same contract as persisted IVF centroids."""
    qs = [i / n_bins for i in range(1, n_bins)]
    row = (
        history.where(F.col("value").isNotNull())
        .agg(
            F.expr(
                "percentile(value, array("
                + ",".join(str(q) for q in qs)
                + "))"
            ).alias("e")
        )
        .collect()[0]
    )
    return [float(x) for x in row.e]


def windowed_bin_counts(
    events_stream: DataFrame,
    edges: list,
    window: str = "10 minutes",
    lateness: str = "5 minutes",
) -> DataFrame:
    """stream(ts, value, ...) -> stream(window_start, window_end, bin, n)
    — watermarked tumbling-window histogram over the static reference
    bins. Bin assignment is a pure aggregate expression over the edge
    literal (no join, no UDF); the windowed count is the only stateful
    stage and the watermark bounds its state to open windows."""
    edge_arr = F.array(*[F.lit(float(e)) for e in edges])
    binned = events_stream.where(F.col("value").isNotNull()).select(
        F.col("ts"),
        (
            1
            + F.aggregate(
                edge_arr,
                F.lit(0),
                lambda acc, e: acc + (F.col("value") > e).cast("int"),
            )
        ).alias("bin"),
    )
    return (
        binned.withWatermark("ts", lateness)
        .groupBy(F.window("ts", window).alias("w"), "bin")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "bin",
            "n",
        )
    )
