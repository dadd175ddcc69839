"""Streaming Count-Min Sketch: per-event-time-window CMS cell tables,
maintained incrementally with watermark-bounded state.

The batch operator (operators/sketches.cms_table) summarizes a static
corpus; at ingest time you want the same fixed-size summary PER WINDOW,
emitted once the watermark closes the window — a continuously produced,
mergeable frequency index (heavy-hitter alerts, per-hour key-skew
monitoring) whose state never grows past
open_windows x depth x width cells, no matter the stream rate.

Same md5-derived probes as the batch sketch, so a window's finalized
cells are BIT-IDENTICAL to cms_table() run over that window's rows —
pinned by tests/test_sketch_stream.py — and merge cell-wise with any
batch-built sketch."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.sketches import _cms_bucket


def windowed_cms_cells(
    events: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    window: str = "1 minute",
    watermark: str = "2 minutes",
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """(window_start, window_end, d, bucket, cnt) — append-mode streaming
    aggregate: the explode is stateless and constant-fanout (`depth` rows
    per event), the windowed count is the only stateful op, and the
    watermark both bounds its state and finalizes each window exactly
    once."""
    coords = F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                _cms_bucket(F.col(key_col), d, width).alias("bucket"),
            )
            for d in range(depth)
        ]
    )
    return (
        events.withWatermark(ts_col, watermark)
        .select(F.col(ts_col), F.explode(coords).alias("c"))
        .groupBy(
            F.window(ts_col, window).alias("win"),
            F.col("c.d").alias("d"),
            F.col("c.bucket").alias("bucket"),
        )
        .agg(F.count("*").cast("long").alias("cnt"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "d",
            "bucket",
            "cnt",
        )
    )


def stream_cms(
    spark,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    schema,
    key_col: str,
    ts_col: str = "ts",
    window: str = "1 minute",
    watermark: str = "2 minutes",
    depth: int = 4,
    width: int = 256,
):
    """availableNow file-source -> windowed CMS cells -> parquet sink in
    append mode (rows emitted only when the watermark finalizes their
    window — exactly-once per window via the checkpoint)."""
    src = spark.readStream.schema(schema).parquet(input_dir)
    cells = windowed_cms_cells(
        src, key_col, ts_col, window, watermark, depth, width
    )
    return (
        cells.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
