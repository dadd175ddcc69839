"""Local stand-in for the driver's CORRECTNESS check: run every
__spark_entry__.queries() entry on Spark and its oracle_sql() twin on DuckDB
at sf0.01, compare row count, column names, and order-insensitive values.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df):
    """pandas frame -> sorted list of row tuples with canonical cells."""
    import pandas as pd

    df = df[sorted(df.columns)]
    rows = []
    for tup in df.itertuples(index=False, name=None):
        row = []
        for v in tup:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                row.append("∅")
            elif isinstance(v, float):
                row.append(f"{v:.9g}")
            elif isinstance(v, pd.Timestamp):
                row.append(v.isoformat())
            else:
                row.append(str(v))
        rows.append(tuple(row))
    return sorted(rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as entry
    from pdf_extractor_spark.session import build_session

    spark = build_session("correctness-check", master="local[8]",
                          shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows-only {name}: {len(sdf)} rows ({dt:.1f}s)")
            n_rows_only += 1
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        if sorted(sdf.columns) != sorted(odf.columns):
            print(f"FAIL {name}: columns {sorted(sdf.columns)} vs {sorted(odf.columns)}")
            n_fail += 1
            continue
        if len(sdf) != len(odf):
            print(f"FAIL {name}: rows {len(sdf)} vs {len(odf)}")
            n_fail += 1
            continue
        # driver's value hash distinguishes 317 from 317.0 — mimic by
        # comparing the numeric KIND (int vs float) per shared column
        kind_mismatch = [
            c for c in sdf.columns
            if sdf[c].dtype.kind in "iuf" and odf[c].dtype.kind in "iuf"
            and (sdf[c].dtype.kind in "iu") != (odf[c].dtype.kind in "iu")
        ]
        if kind_mismatch:
            print(f"FAIL {name}: int/float dtype mismatch in {kind_mismatch} "
                  f"(spark {[str(sdf[c].dtype) for c in kind_mismatch]} vs "
                  f"duckdb {[str(odf[c].dtype) for c in kind_mismatch]})")
            n_fail += 1
            continue
        a, b = canon(sdf), canon(odf)
        if a != b:
            diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
            print(f"FAIL {name}: value mismatch, e.g. {diffs}")
            n_fail += 1
            continue
        print(f"PASS {name}: {len(sdf)} rows ({dt:.1f}s)")
        n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
