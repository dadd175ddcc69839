"""Range-partitioned rank == global-window rank, on tie-heavy data.

The helpers must reproduce the single-task global window bit-for-bit
(same ranks, same ntile tiers) — that is what lets rfm_segments /
rrf_fusion / rank_biased_overlap / degree_ccdf swap their global windows
out without touching their DuckDB oracles."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from pdf_extractor_spark.operators.ranking import (
    ntile_from_rank,
    partitioned_running_sum,
    scalable_row_number,
)


@pytest.fixture(scope="module")
def tiedf(spark):
    # 500 rows, scores drawn from only 7 distinct values -> every range
    # bucket boundary lands inside a tie run
    rows = [(i, (i * 37) % 7, float((i * 13) % 5)) for i in range(500)]
    return spark.createDataFrame(rows, "id int, score int, val double")


@pytest.mark.parametrize("ascending", [True, False])
@pytest.mark.parametrize("n_buckets", [1, 8, 64])
def test_row_number_matches_global_window(tiedf, ascending, n_buckets):
    order = F.col("score").asc() if ascending else F.col("score").desc()
    w = Window.orderBy(order, F.col("id").asc())
    want = {
        r["id"]: r["rank"]
        for r in tiedf.select("id", F.row_number().over(w).alias("rank")).collect()
    }
    got = {
        r["id"]: r["rank"]
        for r in scalable_row_number(
            tiedf, "score", ["id"], ascending=ascending, n_buckets=n_buckets
        ).select("id", "rank").collect()
    }
    assert got == want


def test_running_sum_matches_global_window(tiedf):
    w = (
        Window.orderBy(F.col("score").desc(), F.col("id").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want = {
        r["id"]: r["cum"]
        for r in tiedf.select("id", F.sum("val").over(w).alias("cum")).collect()
    }
    got = {
        r["id"]: r["cum"]
        for r in partitioned_running_sum(
            tiedf, "score", ["id"], val_col="val", ascending=False,
            n_buckets=8, out_col="cum",
        ).select("id", "cum").collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9)


@pytest.mark.parametrize("tiers", [2, 3, 4, 7, 499, 500, 501])
def test_ntile_closed_form(spark, tiers):
    n = 500
    df = spark.createDataFrame(
        [(i, (i * 37) % 7) for i in range(n)], "id int, score int"
    )
    w = Window.orderBy(F.col("score").asc(), F.col("id").asc())
    want = {
        r["id"]: r["t"]
        for r in df.select("id", F.ntile(tiers).over(w).alias("t")).collect()
    }
    ranked = scalable_row_number(df, "score", ["id"], n_buckets=8)
    got = {
        r["id"]: r["t"]
        for r in ranked.withColumn(
            "t", ntile_from_rank(F.col("rank"), F.lit(n), tiers)
        ).select("id", "t").collect()
    }
    assert got == want


@pytest.mark.parametrize("tiers", [2, 3, 5])
def test_grouped_ntile_matches_window(spark, tiers):
    from pdf_extractor_spark.operators.ranking import grouped_ntile

    # skewed groups (one dominant), tie-heavy scores, plus a NULL group
    rows = [
        (i, None if i % 97 == 0 else ("g%d" % (0 if i % 4 else i % 3)),
         float((i * 13) % 6))
        for i in range(600)
    ]
    df = spark.createDataFrame(rows, "id int, grp string, score double")
    w = Window.partitionBy("grp").orderBy(F.col("score").asc(), F.col("id").asc())
    want = {
        r["id"]: r["t"]
        for r in df.select("id", F.ntile(tiers).over(w).alias("t")).collect()
    }
    got = {
        r["id"]: r["tier"]
        for r in grouped_ntile(
            df, "grp", "score", ["id"], tiers, n_buckets=4
        ).select("id", "tier").collect()
    }
    assert got == want


def test_no_unpartitioned_corpus_window(tiedf):
    """The physical plan's only empty-partition-spec window is over the
    bucket-offsets side (n_buckets rows), never the input table: assert
    the full-table window carries a partition spec."""
    out = scalable_row_number(tiedf, "score", ["id"], n_buckets=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # every Window node over _rb-partitioned data names the partition col
    import re

    wins = [l for l in plan.splitlines() if "Window" in l and "row_number" not in l or "windowspecdefinition" in l]
    # the corpus-side window must mention partition column _rb
    assert "_rb" in plan


def test_multi_rank_matches_global_windows(tiedf):
    # the fused three-dimension form (rfm_segments' shape): every spec's
    # rank must equal the corresponding global window's row_number
    from pdf_extractor_spark.operators.ranking import (
        multi_scalable_row_number,
    )

    want = {
        r["id"]: (r["ra"], r["rd"], r["rv"])
        for r in tiedf.select(
            "id",
            F.row_number()
            .over(Window.orderBy(F.col("score").asc(), F.col("id").asc()))
            .alias("ra"),
            F.row_number()
            .over(Window.orderBy(F.col("score").desc(), F.col("id").asc()))
            .alias("rd"),
            F.row_number()
            .over(Window.orderBy(F.col("val").desc(), F.col("id").asc()))
            .alias("rv"),
        ).collect()
    }
    got = {
        r["id"]: (r["ra"], r["rd"], r["rv"])
        for r in multi_scalable_row_number(
            tiedf,
            [
                ("score", ["id"], True, "ra"),
                ("score", ["id"], False, "rd"),
                ("val", ["id"], False, "rv"),
            ],
            n_buckets=8,
        ).select("id", "ra", "rd", "rv").collect()
    }
    assert got == want


def test_rank_engine_property_fuzz(spark):
    """Property fuzz over adversarial score distributions: constant,
    heavily-tied, sparse-outlier, and negative scores must all reproduce
    the global window exactly (the percentile_approx cuts degenerate in
    different ways for each)."""
    from pdf_extractor_spark.operators.ranking import (
        multi_scalable_row_number,
        scalable_row_number,
    )

    cases = {
        "constant": [(i, 7, i % 3) for i in range(200)],
        "two_values": [(i, i % 2, (i * 13) % 5) for i in range(200)],
        "one_outlier": [(i, 10**9 if i == 57 else 1, i % 4)
                        for i in range(200)],
        "negative": [(i, -(i % 11) * 3, (i * 7) % 6) for i in range(200)],
    }
    for name, rows in cases.items():
        df = spark.createDataFrame(rows, "id int, score long, tb int")
        w = Window.orderBy(F.col("score").asc(), F.col("tb").asc(),
                           F.col("id").asc())
        want = {
            r["id"]: r["rk"]
            for r in df.select(
                "id", F.row_number().over(w).alias("rk")
            ).collect()
        }
        got = {
            r["id"]: r["rk"]
            for r in scalable_row_number(
                df, "score", ["tb", "id"], ascending=True,
                n_buckets=8, out_col="rk",
            ).select("id", "rk").collect()
        }
        assert got == want, name
        got2 = {
            r["id"]: r["rk"]
            for r in multi_scalable_row_number(
                df, [("score", ["tb", "id"], True, "rk")], n_buckets=8
            ).select("id", "rk").collect()
        }
        assert got2 == want, ("multi", name)
