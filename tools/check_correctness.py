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


def col_kind(s):
    """Hash-relevant type family of a pandas column: int / float /
    decimal / ts[<tz>] / other. The driver's value hash distinguishes
    317 from 317.0, Decimal('317.0') from 317.0, and tz-aware from naive
    timestamps — a DECIMAL or differently-zoned timestamp column would
    canonicalize to the same string here yet fail the driver, so the
    kind gate must see them."""
    import decimal

    import pandas as pd
    from pandas.api.types import is_datetime64_any_dtype

    k = s.dtype.kind
    if k in "iu":
        return "int"
    if k == "f":
        return "float"
    if is_datetime64_any_dtype(s.dtype):
        return f"ts[{getattr(s.dtype, 'tz', None)}]"
    if k == "O":
        for v in s:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                continue
            if isinstance(v, decimal.Decimal):
                return "decimal"
            if isinstance(v, pd.Timestamp):
                return f"ts[{v.tz}]"
            break
    return "other"


_STRICT_FAMILIES = ("int", "float", "decimal")


def kind_mismatches(sdf, odf):
    """Columns whose type families would hash differently on the driver:
    any int/float/decimal disagreement, and any timestamp disagreement
    (including tz-aware vs naive, or timestamp vs non-timestamp)."""
    bad = []
    for c in sdf.columns:
        ka, kb = col_kind(sdf[c]), col_kind(odf[c])
        if ka == kb:
            continue
        if ka in _STRICT_FAMILIES and kb in _STRICT_FAMILIES:
            bad.append((c, ka, kb))
        elif ka.startswith("ts[") or kb.startswith("ts["):
            bad.append((c, ka, kb))
    return bad


def selftest():
    """The checker must flag deliberately seeded dtype divergences that
    %.9g canonicalization would otherwise hide."""
    import decimal

    import pandas as pd

    f = pd.DataFrame({"x": [1.5]})
    d = pd.DataFrame({"x": [decimal.Decimal("1.5")]})
    i = pd.DataFrame({"x": [1]})
    assert kind_mismatches(f, d), "decimal vs float must be flagged"
    assert kind_mismatches(i, f), "int vs float must be flagged"
    assert not kind_mismatches(f, f.copy()) and not kind_mismatches(d, d.copy())

    naive = pd.DataFrame({"t": [pd.Timestamp("2024-01-01")]})
    utc = pd.DataFrame({"t": [pd.Timestamp("2024-01-01", tz="UTC")]})
    s = pd.DataFrame({"t": ["2024-01-01"]})
    assert kind_mismatches(naive, utc), "tz-aware vs naive must be flagged"
    assert kind_mismatches(naive, s), "timestamp vs string must be flagged"
    assert not kind_mismatches(utc, utc.copy())

    # object-dtype timestamps (duckdb sometimes yields object columns)
    obj_ts = pd.DataFrame(
        {"t": pd.Series([pd.Timestamp("2024-01-01", tz="UTC")], dtype=object)}
    )
    assert not kind_mismatches(utc, obj_ts)
    assert kind_mismatches(naive, obj_ts)
    print("selftest OK: decimal/timestamp divergences are flagged")


def main():
    if sys.argv[1:2] == ["--selftest"]:
        selftest()
        return
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
        # driver's value hash distinguishes 317 from 317.0, DECIMAL from
        # DOUBLE, and tz-aware from naive timestamps — mimic by comparing
        # the hash-relevant type FAMILY per shared column (col_kind)
        bad = kind_mismatches(sdf, odf)
        if bad:
            print(f"FAIL {name}: dtype-family mismatch: "
                  + ", ".join(f"{c} (spark {ka} vs duckdb {kb})"
                              for c, ka, kb in bad))
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
