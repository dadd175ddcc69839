"""Streaming sessionization (applyInPandasWithState, event-time timeout):
sessions close on gap within a batch, across batches via checkpointed
state, and via watermark timeout; state is removed after emission."""

import datetime as dt

from pdf_extractor_spark.streaming.session_stream import streaming_sessions

SCHEMA = "user_id long, ts timestamp"


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def _run(spark, inp, out, ckpt, gap_minutes=30):
    stream = spark.readStream.schema(SCHEMA).parquet(inp)
    sess = streaming_sessions(stream, gap_minutes=gap_minutes)
    q = (
        sess.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return sorted(
        (
            (r.user_id, r.session_start, r.session_end, r.n_events)
            for r in spark.read.parquet(out).collect()
        )
    )


def test_sessions_close_on_gap_and_watermark(spark, tmp_path):
    inp, out, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))

    # batch 1: user 7 has two bursts separated by > gap — burst 1 closes on
    # the gap. The 12:00 event puts the watermark at 11:50, past user 8's
    # timeout (10:00 + 30 min), so 8's session closes by EVENT-TIME TIMEOUT
    # in the same run; 7's 12:00 burst (timeout 12:30) stays open.
    spark.createDataFrame(
        [
            (7, _ts(10, 0)),
            (7, _ts(10, 10)),
            (7, _ts(12, 0)),   # 110 min gap -> closes burst 1
            (8, _ts(10, 0)),
        ],
        SCHEMA,
    ).write.mode("append").parquet(inp)
    got1 = _run(spark, inp, out, ckpt)
    assert got1 == [
        (7, _ts(10, 0), _ts(10, 10), 2),
        (8, _ts(10, 0), _ts(10, 0), 1),
    ]

    # batch 2: 7's 12:05 event first EXTENDS the open session (within gap
    # of 12:00, state restored from the checkpoint); 9's 20:00 event then
    # advances the watermark past 12:35, closing it by timeout
    spark.createDataFrame(
        [(7, _ts(12, 5)), (9, _ts(20, 0))],
        SCHEMA,
    ).write.mode("append").parquet(inp)
    got2 = _run(spark, inp, out, ckpt)
    assert (7, _ts(12, 0), _ts(12, 5), 2) in got2
    # 9's session is still open (nothing beyond it)
    assert not any(u == 9 for u, *_ in got2)

    # batch 3: replaying a closed user's id starts a FRESH session (state
    # was removed on timeout — no leak), and another future event closes 9
    spark.createDataFrame(
        [(8, _ts(21, 0)), (9, _ts(23, 59))],
        SCHEMA,
    ).write.mode("append").parquet(inp)
    got3 = _run(spark, inp, out, ckpt)
    assert (9, _ts(20, 0), _ts(20, 0), 1) in got3
    # 8's fresh 21:00 session must not have absorbed the 10:00 history
    assert not any(
        u == 8 and s == _ts(10, 0) and n > 1 for u, s, e, n in got3
    )


def test_out_of_order_event_extends_session_start(spark, tmp_path):
    """A late-but-within-watermark event that PREDATES the open session's
    start must extend session_start (batch-twin semantics), not be
    absorbed with the start left wrong."""
    inp, out, ckpt = (str(tmp_path / d) for d in ("in2", "out2", "ckpt2"))
    spark.createDataFrame([(5, _ts(12, 0))], SCHEMA).write.mode(
        "append"
    ).parquet(inp)
    _run(spark, inp, out, ckpt)
    # watermark is 11:50; 11:55 is late but accepted, and earlier than the
    # open session's start; 20:00 then closes the session via timeout
    spark.createDataFrame(
        [(5, _ts(11, 55)), (6, _ts(20, 0))], SCHEMA
    ).write.mode("append").parquet(inp)
    got = _run(spark, inp, out, ckpt)
    assert (5, _ts(11, 55), _ts(12, 0), 2) in got


def test_register_views_sql_front_door(spark):
    from pyspark.sql import functions as F

    from pdf_extractor_spark.session import register_views

    names = register_views(spark, "/root/testdata/sf0.001")
    assert {"documents", "events", "lineitem"} <= set(names)
    # the SQL surface compiles to the same Catalyst result as the
    # DataFrame op (tpch_q6 shape)
    sql = spark.sql(
        "SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue "
        "FROM lineitem WHERE l_discount BETWEEN 0.05 AND 0.07 "
        "AND l_quantity < 24"
    ).collect()[0][0]
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    df = (
        li.filter(
            (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4
            ).alias("revenue")
        )
        .collect()[0][0]
    )
    assert sql == df
