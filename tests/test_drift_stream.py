"""Streaming drift bins: reference edges + watermarked windowed counts,
checkpoint-driven availableNow run, batch-parity check."""

import datetime as dt

from pyspark.sql import functions as F

from pdf_extractor_spark.streaming.drift_stream import (
    reference_edges,
    windowed_bin_counts,
)


def _hist(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )


def test_reference_edges(spark):
    t = dt.datetime(2024, 1, 1)
    hist = _hist(spark, [(i, t, 1, "view", float(i)) for i in range(101)])
    edges = reference_edges(hist, n_bins=10)
    # values 0..100: deciles land on 10, 20, ..., 90
    assert edges == [float(x) for x in range(10, 100, 10)]


def test_windowed_bin_counts_stream(spark, tmp_path):
    t = dt.datetime(2024, 1, 1, 12, 0)
    inp, out, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    rows = [
        (1, t, 1, "view", 5.0),                              # bin 1
        (2, t + dt.timedelta(minutes=1), 1, "view", 15.0),   # bin 2
        (3, t + dt.timedelta(minutes=2), 1, "view", 95.0),   # bin 10
        (4, t + dt.timedelta(minutes=11), 1, "view", 5.0),   # next window
        (5, t + dt.timedelta(minutes=30), 1, "view", None),  # dropped
        # a late final event far ahead pushes the watermark so the
        # earlier windows finalize under availableNow
        (6, t + dt.timedelta(hours=2), 1, "view", 50.0),
    ]
    _hist(spark, rows).write.mode("append").parquet(inp)
    edges = [float(x) for x in range(10, 100, 10)]
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, value double"
    ).parquet(inp)
    q = (
        windowed_bin_counts(stream, edges)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.window_start.minute, r.bin): r.n
        for r in spark.read.parquet(out).collect()
        if r.window_start.hour == 12
    }
    assert got[(0, 1)] == 1
    assert got[(0, 2)] == 1
    assert got[(0, 10)] == 1
    assert got[(10, 1)] == 1
