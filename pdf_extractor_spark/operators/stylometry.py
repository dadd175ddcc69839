"""Stylometry: corpus-level authorship/style statistics per source.

  * stylometry_delta — Burrows' Delta (Burrows 2002, public knowledge):
    z-score each source's relative frequency of the corpus's most
    frequent function words, Delta(a, b) = mean |z_a - z_b|; the
    closest pairs are the attribution candidates. The de-facto standard
    of computational stylometry, used in corpus curation to spot
    same-author / same-template source pairs that dedup misses.
  * source_diversity — per-source token diversity: vocabulary size and
    Simpson's index 1 - sum(n_i*(n_i-1)) / (N*(N-1)) (the probability
    two random tokens differ); degenerate template-generated sources
    score low.

Scale: both reduce over (source, token) count tables — the shuffle
moves distinct (source, token) pairs, bounded by sources x vocabulary,
never raw tokens (partial aggregation does the heavy lifting map-side).
The marker-word set is a tiny broadcast; the z-score/delta algebra runs
on a sources x markers table (thousands of rows at most). Rankings
order by the ROUNDED delta so ulp-level float noise cannot reorder
pairs across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _source_token_counts(
    df: DataFrame, text_col: str, source_col: str
) -> DataFrame:
    toks = df.select(
        F.col(source_col).alias("source"),
        F.explode(
            F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")
        ).alias("tok"),
    ).where(F.col("tok") != "")
    return toks.groupBy("source", "tok").agg(F.count("*").alias("n"))


def stylometry_delta(
    df: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    n_markers: int = 10,
    top_k: int = 5,
) -> DataFrame:
    """(rank, src_a, src_b, delta) — the top_k CLOSEST source pairs by
    Burrows' Delta over the `n_markers` most frequent corpus tokens
    (count desc, token asc — deterministic marker choice). z-scores use
    the population standard deviation across sources; a zero-variance
    marker contributes zero. Ties rank by (delta, src_a, src_b).
    """
    st = _source_token_counts(df, text_col, source_col)
    totals = st.groupBy("source").agg(F.sum("n").alias("n_total"))
    # Marker choice is a top-k over the corpus VOCABULARY (unbounded at
    # 100 TB, Heaps' law) — orderBy().limit() compiles to
    # TakeOrderedAndProject (per-partition heaps + driver merge of
    # n_markers rows), never a SinglePartition sort of the vocabulary.
    markers = (
        st.groupBy("tok")
        .agg(F.sum("n").alias("n_all"))
        .orderBy(F.desc("n_all"), F.asc("tok"))
        .limit(n_markers)
        .select("tok")
    )
    # relative frequency per (source, marker); absent pairs are 0
    freqs = (
        totals.crossJoin(F.broadcast(markers))
        .join(st, ["source", "tok"], "left")
        .select(
            "source",
            "tok",
            (F.coalesce(F.col("n"), F.lit(0)) / F.col("n_total")).alias(
                "f"
            ),
        )
    )
    wt = Window.partitionBy("tok")
    z = freqs.select(
        "source",
        "tok",
        F.when(
            F.stddev_pop("f").over(wt) > 0,
            (F.col("f") - F.avg("f").over(wt))
            / F.stddev_pop("f").over(wt),
        )
        .otherwise(F.lit(0.0))
        .alias("z"),
    )
    a = z.select(
        F.col("source").alias("src_a"), "tok", F.col("z").alias("za")
    )
    b = z.select(
        F.col("source").alias("src_b"), "tok", F.col("z").alias("zb")
    )
    pairs = (
        a.join(b, "tok")
        .where(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.round(F.avg(F.abs(F.col("za") - F.col("zb"))), 6).alias("delta"))
    )
    # Pair ranking: limit FIRST (TakeOrderedAndProject over the
    # sources^2/2 pair table), then number the surviving <= top_k rows —
    # the row_number window runs over a bounded post-limit input.
    wr = Window.orderBy("delta", "src_a", "src_b")
    return (
        pairs.orderBy("delta", "src_a", "src_b")
        .limit(top_k)
        .withColumn("rank", F.row_number().over(wr))
        .select("rank", "src_a", "src_b", (F.col("delta") + 0.0).alias("delta"))
    )


def source_diversity(
    df: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """(source, n_tokens, n_distinct, simpson) — per-source vocabulary
    size and Simpson diversity index (integer numerator, one division at
    the end, rounded to 6)."""
    st = _source_token_counts(df, text_col, source_col)
    return st.groupBy("source").agg(
        F.sum("n").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_distinct"),
        F.round(
            1
            - F.sum(F.col("n") * (F.col("n") - 1))
            / (F.sum("n") * (F.sum("n") - 1)),
            6,
        ).alias("simpson"),
    )
