"""Stream-static enrichment: dimension picked up per micro-batch, left
join passes unknown users through as 'new'."""

import datetime as dt

from pdf_extractor_spark.streaming.enrich_stream import (
    enrich_stream,
    user_tier_dimension,
)


def _hist(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )


def test_user_tier_dimension(spark):
    t = dt.datetime(2024, 1, 1)
    hist = _hist(
        spark,
        [
            (1, t, 1, "purchase", 600.0),
            (2, t, 2, "purchase", 150.0),
            (3, t, 3, "purchase", 10.0),
            (4, t, 3, "view", 999.0),  # non-purchase ignored
        ],
    )
    got = {r.user_id: r for r in user_tier_dimension(hist).collect()}
    assert got[1].tier == "gold"
    assert got[2].tier == "silver"
    assert got[3].tier == "bronze" and got[3].lifetime_value == 10.0


def test_enrich_stream_end_to_end(spark, tmp_path):
    t = dt.datetime(2024, 1, 1)
    inp, out, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    dim = user_tier_dimension(
        _hist(spark, [(1, t, 10, "purchase", 700.0)])
    )
    _hist(spark, [(101, t, 10, "view", None), (102, t, 99, "view", None)]).write.mode(
        "append"
    ).parquet(inp)
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, value double"
    ).parquet(inp)
    q = (
        enrich_stream(stream, dim)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.event_id: r for r in spark.read.parquet(out).collect()}
    assert got[101].tier == "gold" and got[101].lifetime_value == 700.0
    # unknown user passes through as 'new' with zero lifetime value
    assert got[102].tier == "new" and got[102].lifetime_value == 0.0
