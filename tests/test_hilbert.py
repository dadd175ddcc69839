"""Hilbert-curve layout key (zorder.hilbert_key): parity with the
reference xy2d walk, the defining unit-step adjacency property (which
Morton does NOT have), bijectivity on a full grid, and the masking
edge."""

from pyspark.sql import functions as F


def _xy2d(order, x, y):
    d = 0
    s = order // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = order - 1 - x
                y = order - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_matches_reference_walk(spark):
    from pdf_extractor_spark.operators.zorder import hilbert_key

    rows = [(i, (7 * i + 3) % 1000, (11 * i + 5) % 1000) for i in range(500)]
    df = spark.createDataFrame(rows, "i long, x long, y long")
    got = {
        r.i: r.h
        for r in df.select(
            "i", hilbert_key(F.col("x"), F.col("y"), bits=10).alias("h")
        ).collect()
    }
    assert got == {i: _xy2d(1 << 10, x, y) for i, x, y in rows}


def test_hilbert_full_grid_bijection_and_adjacency(spark):
    """On the full 16x16 grid (bits=4): the key is a bijection onto
    0..255 AND consecutive keys are Manhattan-distance-1 neighbors —
    the defining Hilbert property (Morton jumps: zorder_key's max
    consecutive step on the same grid is > 1)."""
    from pdf_extractor_spark.operators.zorder import hilbert_key, zorder_key

    rows = [(x * 16 + y, x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(rows, "i long, x long, y long")
    out = df.select(
        "x",
        "y",
        hilbert_key(F.col("x"), F.col("y"), bits=4).alias("h"),
        zorder_key(F.col("x"), F.col("y"), bits=4).alias("z"),
    ).collect()
    by_h = {r.h: (r.x, r.y) for r in out}
    assert sorted(by_h) == list(range(256))
    h_steps = [
        abs(by_h[d + 1][0] - by_h[d][0]) + abs(by_h[d + 1][1] - by_h[d][1])
        for d in range(255)
    ]
    assert set(h_steps) == {1}
    by_z = {r.z: (r.x, r.y) for r in out}
    z_steps = [
        abs(by_z[d + 1][0] - by_z[d][0]) + abs(by_z[d + 1][1] - by_z[d][1])
        for d in range(255)
    ]
    assert max(z_steps) > 1


def test_hilbert_masks_high_bits(spark):
    from pdf_extractor_spark.operators.zorder import hilbert_key

    df = spark.createDataFrame(
        [(5, 9), (5 + (1 << 16), 9 + (1 << 20))], "x long, y long"
    )
    vals = [
        r.h
        for r in df.select(
            hilbert_key(F.col("x"), F.col("y"), bits=16).alias("h")
        ).collect()
    ]
    assert vals[0] == vals[1]
