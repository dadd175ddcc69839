"""encoding_advisor — hand-computed run/dictionary cases."""

from pdf_extractor_spark.operators.maintenance import encoding_advisor


def test_encoding_advisor(spark):
    rows = []
    # 4 orders x 10 lines: l_returnflag constant per order (long runs),
    # l_quantity alternates (runs of 1), l_discount from a 2-value dict,
    # l_extendedprice unique everywhere
    for ok in range(4):
        for ln in range(10):
            rows.append(
                (
                    ok,
                    ln,
                    ln,                         # partkey (tiebreak col)
                    ln,                         # suppkey (tiebreak col)
                    float(ln % 2),              # quantity alternates
                    float(ok * 100 + ln),       # price unique
                    0.05 if ln < 5 else 0.10,   # discount: 2 runs/order
                    "A" if ok % 2 == 0 else "R",  # flag constant per order
                )
            )
    df = spark.createDataFrame(
        rows,
        "l_orderkey long, l_linenumber long, l_partkey long, l_suppkey long, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_returnflag string",
    )
    got = {r.column: r for r in encoding_advisor(df).collect()}
    rf = got["l_returnflag"]
    # one run per order -> 4 runs of length 10
    assert (rf.n, rf.n_runs, rf.avg_run_len, rf.suggested) == (
        40, 4, 10.0, "RLE",
    )
    q = got["l_quantity"]
    # alternating -> a run per row
    assert q.n_runs == 40 and q.avg_run_len == 1.0
    # 2 distinct <= 40/10 -> DICT
    assert q.suggested == "DICT"
    d = got["l_discount"]
    assert d.n_runs == 8 and d.avg_run_len == 5.0 and d.suggested == "RLE"
    p = got["l_extendedprice"]
    assert p.ndv == 40 and p.suggested == "PLAIN"
