"""Streaming CMS: a window's finalized cells are bit-identical to the
batch cms_table over that window's rows, and late rows inside the
watermark still land in their event-time window."""

import datetime as dt
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from pdf_extractor_spark.operators.sketches import cms_table
from pdf_extractor_spark.streaming.sketch_stream import stream_cms

SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("key", T.StringType()),
    ]
)

BASE = dt.datetime(2024, 1, 1, 0, 0, 0)


def _rows(minute_offsets_keys):
    return [
        (BASE + dt.timedelta(minutes=m, seconds=s), k)
        for (m, s, k) in minute_offsets_keys
    ]


def test_stream_cms_matches_batch_per_window(spark, tmp_path):
    inp, out, ckpt = (
        str(tmp_path / d) for d in ("in", "out", "ckpt")
    )
    # window 0 [00:00,00:01) and window 5 [00:05,00:06); the window-5
    # rows advance the watermark (2 min) far past window 0, finalizing it
    drop1 = _rows(
        [(0, 1, "a"), (0, 2, "a"), (0, 30, "b"), (5, 0, "w5"), (5, 1, "w5")]
    )
    spark.createDataFrame(drop1, SCHEMA).write.mode("append").parquet(inp)
    q = stream_cms(
        spark, inp, out, ckpt, SCHEMA, "key", window="1 minute",
        watermark="2 minutes", depth=3, width=16,
    )
    q.awaitTermination(120)

    # a second drop with a LATE-but-within-watermark row cannot exist for
    # the already-finalized window 0; instead it extends window 5's story:
    # new rows at minute 9 finalize window 5
    drop2 = _rows([(9, 0, "z"), (9, 1, "z"), (5, 30, "late-w5")])
    spark.createDataFrame(drop2, SCHEMA).write.mode("append").parquet(inp)
    q2 = stream_cms(
        spark, inp, out, ckpt, SCHEMA, "key", window="1 minute",
        watermark="2 minutes", depth=3, width=16,
    )
    q2.awaitTermination(120)

    got = spark.read.parquet(out)
    w0 = got.filter(F.col("window_start") == BASE).select("d", "bucket", "cnt")
    batch_w0 = cms_table(
        spark.createDataFrame(
            [r for r in drop1 if r[0] < BASE + dt.timedelta(minutes=1)],
            SCHEMA,
        ),
        "key",
        depth=3,
        width=16,
    )
    assert sorted(map(tuple, w0.collect())) == sorted(
        map(tuple, batch_w0.collect())
    )

    # window 5 was finalized by the second drop and INCLUDES the late
    # (within-watermark at its emission time) minute-5:30 row
    w5 = got.filter(
        F.col("window_start") == BASE + dt.timedelta(minutes=5)
    )
    total_w5 = w5.filter(F.col("d") == 0).agg(F.sum("cnt")).collect()[0][0]
    assert total_w5 == 3  # two w5 rows + the late-w5 row
