"""wow_growth, shipping_delay_stats, discount_revenue_curve, image_tiles,
token_length_hist — hand-computed cases."""

import datetime as dt

from pdf_extractor_spark.operators.analytics import (
    discount_revenue_curve,
    shipping_delay_stats,
)
from pdf_extractor_spark.operators.events import wow_growth
from pdf_extractor_spark.operators.multimodal import (
    image_tiles,
    media_from_documents,
)
from pdf_extractor_spark.operators.textstats import token_length_hist


def test_wow_growth(spark):
    rows = (
        # week of Mon 2024-01-01: 2 views; week of Mon 2024-01-08: 4 views
        [(i, dt.datetime(2024, 1, 3), 1, "view", None) for i in range(2)]
        + [(10 + i, dt.datetime(2024, 1, 10), 1, "view", None) for i in range(4)]
    )
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    got = {r.week: r for r in wow_growth(df).collect()}
    assert got["2024-01-01"].n == 2 and got["2024-01-01"].prev_n is None
    assert got["2024-01-01"].growth is None
    assert got["2024-01-08"].n == 4 and got["2024-01-08"].prev_n == 2
    assert got["2024-01-08"].growth == 2.0


def test_shipping_delay_stats(spark):
    orders = spark.createDataFrame(
        [(1, dt.date(2024, 1, 1), "1-URGENT"), (2, dt.date(2024, 1, 1), "1-URGENT")],
        "o_orderkey long, o_orderdate date, o_orderpriority string",
    )
    li = spark.createDataFrame(
        [
            (1, dt.date(2024, 1, 3)),   # delay 2
            (1, dt.date(2024, 1, 5)),   # delay 4
            (2, dt.date(2024, 1, 11)),  # delay 10
        ],
        "l_orderkey long, l_shipdate date",
    )
    r = shipping_delay_stats(li, orders).collect()[0]
    assert r.n == 3
    assert abs(r.avg_delay - round(16 / 3, 6)) < 1e-9
    assert r.median_delay == 4.0
    # p90 at index (3-1)*0.9 = 1.8 -> 4 + 0.8*(10-4) = 8.8
    assert abs(r.p90_delay - 8.8) < 1e-9


def test_discount_revenue_curve(spark):
    li = spark.createDataFrame(
        [
            (0.05, 2.0, 100.0),
            (0.05, 1.0, 200.0),
            (0.10, 1.0, 100.0),
        ],
        "l_discount double, l_quantity double, l_extendedprice double",
    )
    got = {r.discount: r for r in discount_revenue_curve(li).collect()}
    r5 = got[0.05]
    assert (r5.n_items, r5.qty) == (2, 3.0)
    assert r5.revenue == round(0.95 * 300, 2)
    assert r5.avg_item_revenue == round(0.95 * 150, 2)
    assert got[0.10].revenue == 90.0


def test_image_tiles(spark):
    # doc 0 -> image; 129 chars -> width 130, height 130 with 64-tiles:
    # 3 cols x 3 rows, edge tiles 2 px
    rows = [(0, "x" * 129), (1, "not image"), (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    media = media_from_documents(df)
    tiles = image_tiles(media, 64, 64).collect()
    ids = {r.media_id for r in tiles}
    assert ids == {"media-0"}  # doc 1 is audio; doc 3 null text -> dropped
    grid = {(r.tile_row, r.tile_col): r for r in tiles}
    assert len(grid) == 9
    assert (grid[(0, 0)].w, grid[(0, 0)].h) == (64, 64)
    assert (grid[(2, 2)].w, grid[(2, 2)].h) == (2, 2)
    assert (grid[(1, 2)].x0, grid[(1, 2)].y0) == (128, 64)


def test_token_length_hist(spark):
    rows = [(1, "a bb bb CCC"), (2, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.length: r for r in token_length_hist(df).collect()}
    assert got[1].n_tokens == 1 and got[1].n_distinct == 1
    assert got[2].n_tokens == 2 and got[2].n_distinct == 1  # bb twice
    assert got[3].n_tokens == 1
    assert got[2].share == 0.5
