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
