"""Z-order (Morton) clustering — write-time data layout for multi-column
scan pruning.

At 10^12 rows the scan is the only full pass a query should ever pay, and
what a scan can SKIP is decided at write time: sorting by one column makes
that column's min/max file statistics tight and every other column's
useless. Interleaving the bits of two (or more) keys into one Morton value
and range-partitioning + sorting by it gives every participating column
locality, so per-file min/max zone maps prune on ANY of them — the same
layout trick Iceberg/Delta expose as `zorder` table maintenance
(reference has no counterpart; this is pure scale engineering for the
100 TB target).

Both pieces are pure JVM-side column arithmetic:

  * zorder_key   — the Morton value as a fixed dag of shift/and/or terms
                   (2*bits terms, whole-stage-codegen'd; no UDF, no HOF).
                   Deterministic and engine-portable: the DuckDB oracle
                   reproduces it bit-for-bit with the same shifts.
  * zorder_layout— repartitionByRange(zvalue) + sortWithinPartitions:
                   the one full shuffle a layout rewrite costs, after
                   which (z_lo, z_hi) per file bounds BOTH keys.

Keys are masked to the low `bits` bits (bits=20 covers ~10^6 distinct
values per dimension; the interleaved value stays < 2^40, comfortably in
int64). Production layouts first quantile-map skewed keys onto a dense
integer domain — that mapping is corpus state like IVF centroids and is
out of scope for the key itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zorder_key(x: "F.Column", y: "F.Column", bits: int = 20) -> "F.Column":
    """Morton-interleave the low `bits` bits of two non-negative integer
    columns: bit i of x lands at position 2i, bit i of y at 2i+1."""
    x = x.cast("long")
    y = y.cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftrightunsigned(x, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(
                F.shiftrightunsigned(y, i).bitwiseAND(F.lit(1)), 2 * i + 1
            )
        )
    return z


def zorder_layout(
    df: DataFrame, zcol: str = "zvalue", partitions: int | None = None
) -> DataFrame:
    """Cluster rows by an existing Morton key: range-partition so files
    cover disjoint z-ranges, sort within partitions so row groups inside a
    file are tight too. One shuffle — the entire cost of the layout
    rewrite; every subsequent multi-key range scan pays it back in pruning
    (see tests/test_zorder.py for the measured bounding-box tightening)."""
    parts = partitions or df.sparkSession.sparkContext.defaultParallelism
    return df.repartitionByRange(parts, F.col(zcol)).sortWithinPartitions(zcol)


def hilbert_key(x: "F.Column", y: "F.Column", bits: int = 16) -> "F.Column":
    """Hilbert-curve index of the low `bits` bits of two non-negative
    integer columns — the locality-tighter alternative to `zorder_key`:
    consecutive Hilbert values are ALWAYS adjacent cells (the curve has
    no Morton-style discontinuity jumps), so per-file (h_lo, h_hi)
    bounds cover tighter x/y bounding boxes at the same file count.
    Same write-time layout contract as zorder: compute the key, then
    `zorder_layout(df, 'hvalue')`.

    This is the public xy2d walk (the quadrant-rotation formulation of
    the Hilbert curve literature): per bit plane, the quadrant bits
    (rx, ry) contribute s^2 * gray(rx, ry) to the index and the frame
    reflects/swaps for the next plane. The sequential state rides ONE
    `aggregate` fold over a `bits`-element literal plane table (each
    element carries its precomputed s and s^2) — a single expression
    node, so Catalyst cannot re-inline the step into the 4^bits-term
    closed form a naive column chain would produce. Bit tests are
    `x % 2s >= s` (no variable shifts); everything stays in long
    arithmetic, JVM-side, deterministic."""
    n = 1 << bits
    xm = x.cast("long").bitwiseAND(F.lit(n - 1))
    ym = y.cast("long").bitwiseAND(F.lit(n - 1))
    planes = F.array(
        *[
            F.struct(
                F.lit(1 << i).cast("long").alias("s"),
                F.lit((1 << i) * (1 << i)).cast("long").alias("s2"),
            )
            for i in range(bits - 1, -1, -1)
        ]
    )
    init = F.struct(
        xm.alias("x"), ym.alias("y"), F.lit(0).cast("long").alias("d")
    )

    def step(acc, p):
        s, s2 = p["s"], p["s2"]
        rx = F.when(acc["x"] % (s * 2) >= s, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        ry = F.when(acc["y"] % (s * 2) >= s, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        d2 = acc["d"] + s2 * (rx * 3).bitwiseXOR(ry)
        nx = (
            F.when(ry == 1, acc["x"])
            .when(rx == 1, F.lit(n - 1) - acc["y"])
            .otherwise(acc["y"])
        )
        ny = (
            F.when(ry == 1, acc["y"])
            .when(rx == 1, F.lit(n - 1) - acc["x"])
            .otherwise(acc["x"])
        )
        return F.struct(nx.alias("x"), ny.alias("y"), d2.alias("d"))

    return F.aggregate(planes, init, step)["d"]
