"""Z-order layout: key correctness by hand, and the layout property that
justifies it — range-partitioning by the Morton value tightens BOTH keys'
per-partition bounding boxes vs. the same data hash-scattered, which is
exactly what per-file zone maps prune on."""

import pytest
from pyspark.sql import functions as F

from pdf_extractor_spark.operators.zorder import zorder_key, zorder_layout


def _morton(x: int, y: int, bits: int = 20) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_key_matches_reference_bits(spark):
    rows = [(0, 0), (1, 0), (0, 1), (5, 9), (1023, 4095), (2**20 - 1, 7)]
    df = spark.createDataFrame(rows, "x long, y long").select(
        "x", "y", zorder_key(F.col("x"), F.col("y")).alias("z")
    )
    for r in df.collect():
        assert r.z == _morton(r.x, r.y), (r.x, r.y)


def test_zorder_key_interleaves_locality(spark):
    # points close in BOTH coordinates are close in z; the classic
    # checks: (2,2)..(3,3) quad is contiguous [12..15]
    df = spark.createDataFrame(
        [(x, y) for x in range(4) for y in range(4)], "x long, y long"
    ).select("x", "y", zorder_key(F.col("x"), F.col("y")).alias("z"))
    got = {(r.x, r.y): r.z for r in df.collect()}
    assert sorted(got[(x, y)] for x in (2, 3) for y in (2, 3)) == [
        12,
        13,
        14,
        15,
    ]
    assert len(set(got.values())) == 16  # bijective on the grid


def test_zorder_layout_tightens_bounding_boxes(spark):
    # 4096 points on a 64x64 grid, 16 partitions: the z-ordered layout's
    # mean per-partition bounding-box area must be FAR tighter than the
    # hash-scattered layout's (which spans ~the whole grid in every
    # partition). Tight boxes == effective min/max pruning on either key.
    pts = spark.range(4096).select(
        (F.col("id") % 64).alias("x"),
        F.floor(F.col("id") / 64).cast("long").alias("y"),
    )
    keyed = pts.withColumn("zvalue", zorder_key(F.col("x"), F.col("y")))

    def mean_box_area(df):
        boxes = (
            df.withColumn("p", F.spark_partition_id())
            .groupBy("p")
            .agg(
                (F.max("x") - F.min("x") + 1)
                * (F.max("y") - F.min("y") + 1)
            )
        )
        vals = [r[1] for r in boxes.collect()]
        return sum(vals) / len(vals), len(vals)

    z_area, z_parts = mean_box_area(zorder_layout(keyed, partitions=16))
    s_area, s_parts = mean_box_area(keyed.repartition(16, "x", "y"))
    assert z_parts >= 8 and s_parts >= 8
    # 16 z-range partitions of a 64x64 grid are ~16x16 quads (area ~256);
    # hash scatter spans the grid (area ~4096). Require >=4x tightening.
    assert z_area * 4 <= s_area, (z_area, s_area)
