"""Range-partitioned rank / running-sum — the scale-safe replacement for
unpartitioned `Window.orderBy(...)` over unbounded-entity tables.

A global `row_number()` / running-sum window funnels the whole table
through ONE task. This module reproduces the exact same output with no
global sort, using the partition-offset technique (same family as
curation.global_shuffle's 256-shard offset table):

1. broadcast `percentile_approx` cut points split rows into range
   buckets of the primary order column. Equal values always share a
   bucket (strict comparison against the cuts), so the total order
   "bucket, then (value, tiebreak) within bucket" is EXACTLY the global
   `(value, tiebreak)` order — cut-point placement affects only balance,
   never correctness, which also makes percentile_approx's
   approximation harmless;
2. a per-bucket window computes the local rank / running sum;
3. the global offset of each bucket is a running sum over the
   bucket-totals table — the only single-partition window touches
   `n_buckets` rows, never the corpus.

Cost: one extra aggregate for the cuts + a broadcast of `n_buckets`
offsets, versus the global window's all-rows-in-one-task sort. At 10^9+
entities this is the difference between a working plan and a straggler.

Ties in the primary column are ordered by the caller's tiebreak columns
within their (shared) bucket, so results are deterministic and identical
to the global-window form — asserted by tests/test_ranking.py on data
with heavy ties, and by the unchanged DuckDB oracles of every operator
rewired onto this helper (rfm_segments, rrf_fusion, rank_biased_overlap,
degree_ccdf)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _with_range_bucket(
    df: DataFrame, score_col: str, ascending: bool, n_buckets: int
) -> DataFrame:
    """+ `_rb`: range-bucket index that is monotone in the sort order of
    `score_col` and constant across equal values (strict compare against
    the broadcast cut array). Requires non-null scores."""
    if n_buckets < 2:
        return df.withColumn("_rb", F.lit(0))
    probs = [i / n_buckets for i in range(1, n_buckets)]
    cuts = df.agg(F.percentile_approx(score_col, probs).alias("_cuts"))
    s = F.col(score_col)
    bucket = F.size(
        F.filter(
            F.col("_cuts"), (lambda c: c < s) if ascending else (lambda c: c > s)
        )
    )
    return (
        df.crossJoin(F.broadcast(cuts))
        .withColumn("_rb", bucket)
        .drop("_cuts")
    )


def partitioned_rank_and_sums(
    df: DataFrame,
    score_col: str,
    tiebreak_cols: list[str],
    val_cols: "tuple[str, ...]" = (),
    ascending: bool = True,
    n_buckets: int = 64,
    rank_col: "str | None" = None,
    sum_prefix: str = "_cum_",
) -> DataFrame:
    """df + optional exact global row_number (`rank_col`) + one exact
    running sum per `val_cols` entry (named `sum_prefix + col`), all
    over the total order (`score_col` asc|desc, *tiebreak_cols asc), in
    ONE range-bucketed pass — the multi-output form of the module's
    partition-offset technique (several cumulative outputs share one
    exchange and one bounded offsets table instead of stacking helper
    calls, which would re-read the input per call).

    `score_col` must be non-null and numeric (it feeds
    percentile_approx); the tiebreaks may be any orderable columns."""
    b = _with_range_bucket(df, score_col, ascending, n_buckets)
    order = [
        F.col(score_col).asc() if ascending else F.col(score_col).desc(),
        *[F.col(c).asc() for c in tiebreak_cols],
    ]
    w_rank = Window.partitionBy("_rb").orderBy(*order)
    w_sum = w_rank.rowsBetween(Window.unboundedPreceding, 0)
    aggs = [F.count("*").cast("long").alias("_bn")] + [
        F.sum(v).alias(f"_bs_{v}") for v in val_cols
    ]
    totals = b.groupBy("_rb").agg(*aggs)
    woff = Window.orderBy("_rb").rowsBetween(Window.unboundedPreceding, -1)
    off_cols = [
        F.coalesce(F.sum("_bn").over(woff), F.lit(0).cast("long")).alias(
            "_boff"
        )
    ] + [
        F.coalesce(F.sum(f"_bs_{v}").over(woff), F.lit(0)).alias(
            f"_boff_{v}"
        )
        for v in val_cols
    ]
    offsets = totals.select("_rb", *off_cols)
    out = b.join(F.broadcast(offsets), "_rb")
    if rank_col is not None:
        out = out.withColumn(
            rank_col, F.col("_boff") + F.row_number().over(w_rank)
        )
    for v in val_cols:
        out = out.withColumn(
            f"{sum_prefix}{v}",
            F.col(f"_boff_{v}") + F.sum(v).over(w_sum),
        )
    return out.drop(
        "_rb", "_boff", *[f"_boff_{v}" for v in val_cols]
    )


def partitioned_running_sum(
    df: DataFrame,
    score_col: str,
    tiebreak_cols: list[str],
    val_col: "str | None" = None,
    ascending: bool = True,
    n_buckets: int = 64,
    out_col: str = "rank",
) -> DataFrame:
    """df + `out_col` = running sum of `val_col` (or row count when None,
    i.e. exact global row_number) over the total order
    (`score_col` asc|desc, *tiebreak_cols asc) — with no global window.

    `score_col` must be non-null and numeric (it feeds
    percentile_approx); the tiebreaks may be any orderable columns."""
    b = _with_range_bucket(df, score_col, ascending, n_buckets)
    val = F.lit(1).cast("long") if val_col is None else F.col(val_col)
    order = [
        F.col(score_col).asc() if ascending else F.col(score_col).desc(),
        *[F.col(c).asc() for c in tiebreak_cols],
    ]
    w = (
        Window.partitionBy("_rb")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    totals = b.groupBy("_rb").agg(F.sum(val).alias("_bt"))
    woff = Window.orderBy("_rb").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "_rb",
        F.coalesce(F.sum("_bt").over(woff), F.lit(0).cast("long")).alias(
            "_boff"
        ),
    )
    out = (
        b.join(F.broadcast(offsets), "_rb")
        .withColumn(out_col, F.col("_boff") + F.sum(val).over(w))
        .drop("_rb", "_boff")
    )
    return out


def scalable_row_number(
    df: DataFrame,
    score_col: str,
    tiebreak_cols: list[str],
    ascending: bool = True,
    n_buckets: int = 64,
    out_col: str = "rank",
) -> DataFrame:
    """Exact global row_number() over (`score_col`, *tiebreaks) with no
    single-task sort; see module docstring."""
    return partitioned_running_sum(
        df,
        score_col,
        tiebreak_cols,
        val_col=None,
        ascending=ascending,
        n_buckets=n_buckets,
        out_col=out_col,
    )


def grouped_ntile(
    df: DataFrame,
    group_col: str,
    score_col: str,
    tiebreak_cols: list[str],
    tiers: int,
    n_buckets: int = 16,
    out_col: str = "tier",
) -> DataFrame:
    """df + `out_col` = exact per-group `ntile(tiers)` over
    (`score_col` asc, *tiebreak_cols asc) with NO per-group corpus sort:
    per-group percentile_approx cut points split each group into range
    sub-buckets, windows run per (group, sub-bucket), and per-group
    offsets/totals come from the bounded (groups x n_buckets) count
    table. A dominant group (one language = half the corpus) therefore
    sorts in n_buckets parallel tasks instead of one. NULL group keys
    form their own group (null-safe joins), matching
    `Window.partitionBy(group)` semantics. Output is bit-identical to
    `ntile().over(partitionBy(group).orderBy(...))`."""
    gc = F.col(group_col)
    s = F.col(score_col)
    probs = [i / n_buckets for i in range(1, n_buckets)]
    cuts = df.groupBy(gc.alias("_g")).agg(
        F.percentile_approx(score_col, probs).alias("_cuts")
    )
    b = (
        df.join(F.broadcast(cuts), gc.eqNullSafe(F.col("_g")))
        .withColumn("_rb", F.size(F.filter(F.col("_cuts"), lambda c: c < s)))
        .drop("_cuts", "_g")
    )
    counts = b.groupBy(gc.alias("_g"), "_rb").agg(
        F.count("*").cast("long").alias("_n")
    )
    woff = (
        Window.partitionBy("_g")
        .orderBy("_rb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "_g",
        F.col("_rb").alias("_rb2"),
        F.coalesce(F.sum("_n").over(woff), F.lit(0).cast("long")).alias(
            "_boff"
        ),
        F.sum("_n").over(Window.partitionBy("_g")).alias("_gtot"),
    )
    order = [s.asc(), *[F.col(c).asc() for c in tiebreak_cols]]
    w = Window.partitionBy(group_col, "_rb").orderBy(*order)
    joined = b.join(
        F.broadcast(offsets),
        gc.eqNullSafe(F.col("_g")) & (F.col("_rb") == F.col("_rb2")),
    ).drop("_rb2")
    rank = F.col("_boff") + F.row_number().over(w)
    return joined.withColumn(
        out_col, ntile_from_rank(rank, F.col("_gtot"), tiers)
    ).drop("_rb", "_g", "_boff", "_gtot")


def _cut_cmp(score: Column, ascending: bool):
    # closure factory: a `lambda c, _s=score` default-arg form would be
    # introspected by F.filter as the (element, index) two-arg variant
    # and silently receive the INDEX (see curation._sub_of)
    if ascending:
        return lambda c: c < score
    return lambda c: c > score


def multi_scalable_row_number(
    df: DataFrame,
    specs: "list[tuple[str, list[str], bool, str]]",
    n_buckets: int = 64,
) -> DataFrame:
    """df + one exact global row_number column PER SPEC — the fused
    multi-dimension form of `scalable_row_number` for operators that
    rank the same frame under several orders (rfm_segments' three
    recency/frequency/monetary tiers).

    specs: [(score_col, tiebreak_cols, ascending, out_col), ...].

    vs N independent scalable_row_number calls joined back on the row
    key: ALL cut arrays come from ONE aggregate pass (one scan instead
    of N), every bucket-offset table derives from the same
    _rb-projection, and each dimension's rank lands as a column via a
    per-bucket window + tiny broadcast offset join — the N row-key
    shuffle joins disappear. Output ranks are bit-identical to the
    single-dimension helper (same bucket/offset mechanism), asserted by
    tests/test_ranking.py.

    The input should be cheap to recompute (a scan) or already
    materialized (rfm_segments hands in a localCheckpoint): the cuts
    aggregate and the fused bucket-totals aggregate re-derive `df`, so
    an expensive un-checkpointed upstream would re-run twice."""
    if n_buckets < 2:
        # one bucket — no cut points to compute or attach; every spec's
        # range-bucket is the single bucket 0 (short-circuit: the
        # percentile_approx aggregate and its crossJoin would otherwise
        # run with an empty probs list for nothing)
        pre = df
        for _s, _tb, _asc, o in specs:
            pre = pre.withColumn(f"_rb_{o}", F.lit(0))
    else:
        probs = [i / n_buckets for i in range(1, n_buckets)]
        cuts = df.agg(
            *[
                F.percentile_approx(s, probs).alias(f"_cuts_{o}")
                for s, _tb, _asc, o in specs
            ]
        )
        pre = df.crossJoin(F.broadcast(cuts))
        for s, _tb, asc, o in specs:
            pre = pre.withColumn(
                f"_rb_{o}",
                F.size(
                    F.filter(F.col(f"_cuts_{o}"), _cut_cmp(F.col(s), asc))
                ),
            )
        pre = pre.drop(*[f"_cuts_{o}" for _s, _tb, _asc, o in specs])
    # ALL bucket-count tables in ONE grouping-sets aggregate over the
    # pre-window frame (one pass instead of len(specs); computing them
    # from `out` would additionally re-run every earlier dimension's
    # window sort inside this dimension's aggregate). The fused table is
    # bounded (n_buckets rows per spec), and each spec's slice is
    # identified by its non-null grouping column.
    rb_cols = [f"_rb_{o}" for _s, _tb, _asc, o in specs]
    if len(specs) > 1:
        # eager checkpoint: the bounded fused table feeds one broadcast
        # per spec; lazy, each broadcast would replay the whole aggregate
        fused = (
            pre.groupingSets(
                [[c] for c in rb_cols], *[F.col(c) for c in rb_cols]
            )
            .agg(F.count("*").alias("_bt"))
            .localCheckpoint(eager=True)
        )
    else:
        fused = pre.groupBy(rb_cols[0]).agg(F.count("*").alias("_bt"))
    out = pre
    for si, (s, tb, asc, o) in enumerate(specs):
        rb = f"_rb_{o}"
        totals = fused.where(F.col(rb).isNotNull()).select(rb, "_bt")
        woff = Window.orderBy(rb).rowsBetween(
            Window.unboundedPreceding, -1
        )
        offsets = totals.select(
            rb,
            F.coalesce(F.sum("_bt").over(woff), F.lit(0).cast("long")).alias(
                f"_boff_{o}"
            ),
        )
        order = [
            F.col(s).asc() if asc else F.col(s).desc(),
            *[F.col(c).asc() for c in tb],
        ]
        w = Window.partitionBy(rb).orderBy(*order)
        out = (
            out.join(F.broadcast(offsets), rb)
            .withColumn(
                o, F.col(f"_boff_{o}") + F.row_number().over(w)
            )
            .drop(rb, f"_boff_{o}")
        )
    return out


def ntile_from_rank(rank: Column, n: Column, tiers: int) -> Column:
    """Closed-form `ntile(tiers)` from a global 1-based row_number and the
    total row count: the first (n % tiers) buckets hold (n//tiers + 1)
    rows, the rest n//tiers — exactly Spark/ANSI ntile semantics, so a
    scalable_row_number + this map replaces `ntile().over(global window)`
    bit-for-bit."""
    q = F.floor(n / tiers)
    rem = n - q * tiers
    cut = rem * (q + 1)
    q_safe = F.greatest(q, F.lit(1))  # q=0 (n < tiers) never reaches ELSE
    return (
        F.when(rank <= cut, F.floor((rank - 1) / (q + 1)) + 1)
        .otherwise(rem + F.floor((rank - cut - 1) / q_safe) + 1)
        .cast("int")
    )
