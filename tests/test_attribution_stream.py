"""Stream-stream click->purchase attribution join: pairs inside the
attribution window match, pairs outside don't, matches span micro-batches
via checkpointed join state, and the watermark expires buffered state."""

import datetime as dt

from pdf_extractor_spark.streaming.attribution_stream import (
    attributed_purchases,
    split_event_streams,
)

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def _run(spark, inp, out, ckpt):
    stream = spark.readStream.schema(SCHEMA).parquet(inp)
    clicks, purchases = split_event_streams(stream)
    joined = attributed_purchases(clicks, purchases, attribution_minutes=30)
    q = (
        joined.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return sorted(
        (r.user_id, r.click_ts, r.purchase_ts, r.value)
        for r in spark.read.parquet(out).collect()
    )


def test_attribution_window_and_cross_batch_state(spark, tmp_path):
    inp, out, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))

    # batch 1: user 1 clicks 10:00, purchases 10:10 (inside 30 min) and
    # 11:30 (outside); user 2 purchases with no click at all
    spark.createDataFrame(
        [
            (1, _ts(10, 0), 1, "click", 0.0),
            (2, _ts(10, 10), 1, "purchase", 9.5),
            (3, _ts(11, 30), 1, "purchase", 4.0),
            (4, _ts(10, 5), 2, "purchase", 7.0),
        ],
        SCHEMA,
    ).write.mode("append").parquet(inp)
    got1 = _run(spark, inp, out, ckpt)
    assert got1 == [(1, _ts(10, 0), _ts(10, 10), 9.5)]

    # batch 2: user 3's click arrives; its purchase lands in the SAME
    # window but a LATER micro-batch — the buffered click state from the
    # checkpoint must still match it. A click matching MULTIPLE purchases
    # emits one row per purchase.
    spark.createDataFrame(
        [
            (5, _ts(12, 0), 3, "click", 0.0),
            (6, _ts(12, 1), 3, "purchase", 1.0),
        ],
        SCHEMA,
    ).write.mode("append").parquet(inp)
    _run(spark, inp, out, ckpt)
    spark.createDataFrame(
        [(7, _ts(12, 20), 3, "purchase", 2.0)],
        SCHEMA,
    ).write.mode("append").parquet(inp)
    got3 = _run(spark, inp, out, ckpt)
    assert (3, _ts(12, 0), _ts(12, 1), 1.0) in got3
    assert (3, _ts(12, 0), _ts(12, 20), 2.0) in got3

    # batch 3: advance BOTH sides' event time to 20:00 — the global
    # watermark is the MIN of the click and purchase watermarks, so a
    # click-only burst would leave the purchase watermark (and state
    # expiry) behind. After this batch the 12:00 click's buffer is
    # evictable (purchase watermark 19:00 > 12:00 + 30 min), and a replay
    # inside the old window must produce no new pair.
    spark.createDataFrame(
        [
            (8, _ts(20, 0), 9, "click", 0.0),
            (10, _ts(20, 0), 9, "purchase", 50.0),
        ],
        SCHEMA,
    ).write.mode("append").parquet(inp)
    _run(spark, inp, out, ckpt)
    spark.createDataFrame(
        [(9, _ts(12, 25), 3, "purchase", 3.0)],
        SCHEMA,
    ).write.mode("append").parquet(inp)
    got5 = _run(spark, inp, out, ckpt)
    assert not any(v == 3.0 for *_, v in got5)
