"""Event-stream relational operators: gap sessionization and as-of join.

Neither exists in the reference (its analytics layer is the dashboard's
in-memory pandas, SURVEY §2.7/2.8); both are table-stakes for a
training-data/analytics engine at log scale, and both are implemented the
way that survives 10^12 rows:

- sessionize: lag + running-sum windows over (user_id) — one hash shuffle
  on the user key, O(1) state per row, no self-join.
- asof_join: the union + last_value(ignorenulls) carry-forward trick —
  ONE shuffle over the combined stream instead of a per-row range probe
  or an exploded interval join. This is the standard scalable as-of
  pattern (a sort-merge as-of join expressed with primitives Catalyst
  already optimizes); the DuckDB oracle uses DuckDB's native ASOF JOIN,
  making the cross-check a genuinely independent implementation.

Skew note: both partition by user_id; a power-law user would concentrate a
partition, but per-user event counts in web logs are bounded enough for
window state (single pass, spillable sort) — the same profile Spark's
sessionization examples assume. AQE skew handling covers the tail.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Assign gap-based session numbers: a new session starts when the gap
    from the user's previous event exceeds `gap_minutes`. Deterministic
    under ts ties via the id tiebreaker. Adds session_num (1-based per
    user) and is_session_start."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    prev_ts = F.lag(ts_col).over(w)
    # exact microsecond epoch, NOT unix_timestamp: the event log carries
    # microsecond timestamps, and second-truncation would disagree with
    # the oracle's fractional epoch() and the streaming twin's
    # millisecond state on gaps within 1s of the threshold. (ltz cast:
    # Spark 4 forbids casting NTZ timestamps to numbers; the conversion
    # offset cancels in the subtraction.)
    def _us(c):
        return F.unix_micros(c.cast("timestamp_ltz"))

    is_start = prev_ts.isNull() | (
        _us(F.col(ts_col)) - _us(prev_ts) > gap_minutes * 60 * 1_000_000
    )
    running = Window.partitionBy(user_col).orderBy(ts_col, id_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return events.withColumn(
        "is_session_start", is_start
    ).withColumn(
        "session_num", F.sum(F.col("is_session_start").cast("long")).over(running)
    )


def session_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Per-session rollup (user_id, session_num, session_start,
    session_end, n_events, n_purchases). The groupBy reuses the window's
    (user_id) hash partitioning — Catalyst elides the second shuffle."""
    s = sessionize(events, user_col, ts_col, id_col, gap_minutes)
    return s.groupBy(user_col, "session_num").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count("*").cast("long").alias("n_events"),
        F.sum(
            (F.col("event_type") == "purchase").cast("long")
        ).alias("n_purchases"),
    )


def bucketed_range_join(
    facts: DataFrame,
    windows: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Range join (fact.ts in [window.start, window.end)) as a bucketized
    equi-join: each window explodes into the time buckets it covers, facts
    map to their bucket, the join is a plain hash equi-join on the bucket,
    and the exact containment predicate filters the boundary buckets.

    This is the big×big scale pattern: a naive inequality join is a
    nested-loop (Spark: BroadcastNestedLoopJoin, only viable when one side
    broadcasts); bucketizing turns it into a shuffle hash/sort-merge join
    whose fan-out is windows × (span/bucket) — bounded when bucket_seconds
    is chosen near the typical window length. The DuckDB oracle uses a
    native inequality join (IEJoin), an independent implementation.

    End-exclusive: a window covers buckets floor(start/b)..ceil(end/b)-1
    (fractional-second epochs — the event log carries microseconds, and a
    second-truncated end just past a bucket boundary would silently drop
    the last bucket's facts); empty (end <= start) windows match nothing."""
    b_us = int(bucket_seconds) * 1_000_000

    def _us(c):
        # exact microsecond epoch; ltz cast because Spark 4 forbids
        # casting NTZ timestamps to numbers (offset is bucket-consistent)
        return F.unix_micros(c.cast("timestamp_ltz"))

    wb = windows.filter(F.col(end_col) > F.col(start_col)).withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(_us(F.col(start_col)) / b_us),
                F.ceil(_us(F.col(end_col)) / b_us) - 1,
            )
        ),
    )
    fb = facts.withColumn("_bucket", F.floor(_us(F.col(ts_col)) / b_us))
    return (
        fb.join(wb, "_bucket")
        .filter(
            (F.col(ts_col) >= F.col(start_col))
            & (F.col(ts_col) < F.col(end_col))
        )
        .drop("_bucket")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    ts_col: str,
    payload_cols: list[str],
    left_order_col: str,
    prefix: str = "asof_",
) -> DataFrame:
    """For each left row, attach the latest right row with right.ts <=
    left.ts within the same `by` group (inclusive, matching DuckDB ASOF
    semantics); nulls when no prior right row exists.

    Requires right to be unique per (by, ts) — pre-aggregate with
    max_by/arg_max if it is not (ties would otherwise be order-dependent
    in ANY as-of implementation). Single shuffle: union both streams, one
    window per `by`, last_value(ignorenulls) carry-forward; right rows
    sort before left rows at equal ts so <= holds."""
    payload = F.struct(*[F.col(c).alias(c) for c in payload_cols])
    r = right.select(
        F.col(by),
        F.col(ts_col),
        F.lit(0).alias("_side"),
        payload.alias("_payload"),
    )
    l = left.select(
        "*",
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload"),
    )
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(by)
        .orderBy(ts_col, "_side", F.coalesce(F.col(left_order_col), F.lit(-1)))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("_asof", F.last("_payload", ignorenulls=True).over(w))
    out = u.filter(F.col("_side") == 1).drop("_side", "_payload")
    for c in payload_cols:
        out = out.withColumn(prefix + c, F.col("_asof")[c])
    return out.drop("_asof")


def funnel_conversion(
    events: DataFrame,
    stages: tuple[str, ...] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """(stage, depth, n_users) — ordered funnel conversion: a user reaches
    stage k iff they have a stage-k event STRICTLY AFTER their earliest
    qualifying stage-(k-1) event (the standard product-analytics funnel;
    earliest-qualifying, not any-pairing, so the count is well-defined and
    deterministic). Timestamp comparisons are exact (microsecond ints), so
    the DuckDB oracle matches bit-for-bit.

    Scale shape: one filtered aggregate per stage, each keyed on user_id —
    every join/aggregate in the cascade shuffles on the SAME key, so AQE
    reuses one exchange layout; no windows over the full event stream, no
    per-user arrays (a user's event count never materializes in memory)."""
    e = events.select(
        F.col(user_col).alias("uid"),
        F.col(type_col).alias("et"),
        F.col(ts_col).alias("t"),
    )
    reached = None  # DataFrame(uid, tk) of users at the previous depth
    out = None
    for depth, stage in enumerate(stages, start=1):
        stage_events = e.filter(F.col("et") == stage)
        if reached is not None:
            stage_events = stage_events.join(reached, "uid").where(
                F.col("t") > F.col("tk")
            ).select("uid", "t")
        reached = stage_events.groupBy("uid").agg(F.min("t").alias("tk"))
        row = reached.agg(
            F.lit(" -> ".join(stages[:depth])).alias("stage"),
            F.lit(depth).cast("long").alias("depth"),
            F.count("*").cast("long").alias("n_users"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(cohort_date, day_offset, n_users) — classic retention triangle:
    users are cohorted by the calendar date of their first event, and each
    (cohort, offset) cell counts the distinct cohort members active
    day_offset days later. All-integer date arithmetic -> exact oracle.

    Scale shape: first-event aggregate keyed on user (one shuffle), join
    back along the same key (exchange reuse), then the cell aggregate —
    cells are bounded by days^2/2, so the final aggregate is tiny however
    large the event stream is."""
    e = events.select(
        F.col(user_col).alias("uid"), F.to_date(ts_col).alias("d")
    )
    first = e.groupBy("uid").agg(F.min("d").alias("cohort_date"))
    return (
        e.join(first, "uid")
        .groupBy(
            "cohort_date",
            F.datediff(F.col("d"), F.col("cohort_date")).cast("long").alias(
                "day_offset"
            ),
        )
        .agg(F.count_distinct(F.col("uid")).cast("long").alias("n_users"))
    )


def key_skew_stats(
    df: DataFrame,
    key_col: str = "user_id",
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """(metric, value) — shuffle-skew diagnostics for a join/agg key:
    n_keys, total_rows, max_count, exact count quantiles (p50/p90/p99 by
    default), and top1_share (heaviest key's row share). The operator that
    tells you whether a key needs salting BEFORE the 100 TB job dies.

    Exactness: quantiles are rank-selected from the count-of-counts
    histogram (value = smallest count c whose cumulative key coverage
    reaches rank 1 + floor(q*(n_keys-1)) — all integer arithmetic), so the
    DuckDB oracle matches exactly; only top1_share divides (rounded 6 dp).

    Scale shape: one partial-agg shuffle to per-key counts, a second tiny
    aggregate to the count-of-counts histogram; the histogram's
    cumulative coverage comes from the range-partitioned running sum
    (ranking.partitioned_running_sum) — distinct count values are far
    below the key space (~10^5 for 10^9 keys) but the pattern stays
    single-task-free regardless, same as degree_ccdf."""
    counts = df.groupBy(F.col(key_col).alias("k")).agg(
        F.count("*").alias("c")
    )
    hist = counts.groupBy("c").agg(
        F.count("*").alias("nk")
    ).localCheckpoint(eager=True)
    from .ranking import partitioned_running_sum

    cum = partitioned_running_sum(
        hist, "c", [], val_col="nk", ascending=True, out_col="cum"
    )
    # every summary derives from the checkpointed histogram — the corpus
    # shuffles ONCE into per-key counts, and nothing below ever re-reads
    # it (the r3 plan re-aggregated `counts` per unionByName branch: 32
    # exchanges for seven numbers)
    totals = hist.agg(
        F.sum("nk").alias("n_keys"),
        F.sum(F.col("c") * F.col("nk")).alias("total_rows"),
        F.max("c").alias("max_count"),
    )
    # all quantiles in ONE aggregate over the (bounded) cumulative
    # histogram: rank 1 + floor(q * (n_keys - 1)) is all-integer once q
    # is a config literal with an exact decimal expansion (0.5/0.9/0.99)
    qcols = [
        F.min(
            F.when(
                F.col("cum")
                >= 1 + F.floor(F.lit(q) * (F.col("n_keys") - 1)),
                F.col("c"),
            )
        ).alias(f"_q{int(q * 100)}")
        for q in quantiles
    ]
    qrow = cum.crossJoin(F.broadcast(totals)).agg(*qcols)
    # single joined row -> stack() into the (metric, value) frame: one
    # projection, zero unionByName branches
    pairs = [
        ("n_keys", F.col("n_keys").cast("double")),
        ("total_rows", F.col("total_rows").cast("double")),
        ("max_count", F.col("max_count").cast("double")),
        (
            "top1_share",
            F.round(
                F.col("max_count").cast("double") / F.col("total_rows"), 6
            ),
        ),
    ] + [
        (f"p{int(q * 100)}_count", F.col(f"_q{int(q * 100)}").cast("double"))
        for q in quantiles
    ]
    stack_args = []
    for name, col in pairs:
        stack_args += [F.lit(name), col]
    return totals.crossJoin(qrow).select(
        F.stack(F.lit(len(pairs)), *stack_args).alias("metric", "value")
    )


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: when one fact key carries a disproportion
    of rows (see key_skew_stats), a plain shuffle join funnels that key
    into ONE reducer. Here the fact side gets a deterministic salt
    (xxhash64 of the whole row, mod `salt`) and the dim side is exploded
    x`salt`, so the join key becomes (key, salt) and the hot key spreads
    over `salt` reducers. Join OUTPUT is provably identical to the
    unsalted join (each fact row meets exactly one dim replica); only the
    physical distribution changes — which is why the DuckDB oracle is the
    plain join.

    Cost model: dim inflates x`salt` (use for corpus-sized dims too big to
    broadcast but far smaller than facts — the classic mid-size dim with a
    hot fact key). For small dims prefer broadcast; for balanced keys
    prefer the plain join; AQE's skew-join handles moderate skew without
    either, but cannot split a single key hotter than one task's budget at
    plan time the way explicit salting can."""
    fact_cols = [F.col(c) for c in facts.columns]
    salted_facts = facts.withColumn(
        "_salt", F.pmod(F.xxhash64(*fact_cols), F.lit(salt)).cast("int")
    )
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return salted_facts.join(salted_dim, [key, "_salt"], how).drop("_salt")


def event_dedup(
    events: DataFrame,
    gap_seconds: int = 3600,
    key_cols: "tuple[str, ...]" = ("user_id", "event_type"),
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """events + is_dup — debounce duplicate events: a row is a duplicate
    if the SAME key (user, type) fired within `gap_seconds` of the
    PREVIOUS firing (lag semantics — the standard double-fire / retry
    hygiene filter for instrumentation logs; chained rapid fires are all
    duplicates of their predecessor, which is what retry storms look
    like). Deterministic order inside a key: (ts, event_id). Timestamps
    compare at microsecond precision (unix_micros — exact integers in
    both engines, no sub-second truncation).

    Scale shape: ONE hash shuffle on the dedup key, a lag window inside
    each key partition. Per-key partitions are per-user-per-type slices —
    the same skew class the sessionizer handles; no global sort."""
    w = Window.partitionBy(*key_cols).orderBy(ts_col, id_col)
    # the events table carries TIMESTAMP_NTZ; the cast (session tz is
    # pinned UTC) shifts both lag sides identically, so gaps are exact
    mic = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev = F.lag(mic).over(w)
    return events.withColumn(
        "is_dup",
        F.coalesce(
            mic - prev <= F.lit(gap_seconds * 1_000_000), F.lit(False)
        ),
    )


def resample_locf(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """(user_id, hour_ts, n_events, value_locf) — hypertable-style
    resampling: each user's event stream becomes a dense hourly grid
    between their first and last event, with the event count per bucket
    (0 on gap hours) and the value carried forward from the most recent
    observation (LOCF). The per-bucket representative is the LAST event
    by (ts, event_id) — a struct-max argmax, deterministic under ties —
    and the carry is last(ignoreNulls) over the grid, so a bucket whose
    own representative has a NULL value still inherits the prior one.

    Scale: events partial-aggregate to ONE row per (user, hour) before
    any shuffle; the grid is explode-of-sequence (no Python) sized
    users x active-hours, not events; bounds, bucket rows and the LOCF
    window all hash on user_id — one co-partitioned exchange family.
    Rows with NULL user/ts are dropped (no grid to place them on)."""
    base = events.where(
        F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(
        F.col(user_col).alias("user_id"),
        F.date_trunc("hour", F.col(ts_col)).alias("hour_ts"),
        F.col(ts_col).alias("_ts"),
        F.col(id_col).alias("_id"),
        F.col(value_col).alias("_v"),
    )
    hourly = base.groupBy("user_id", "hour_ts").agg(
        F.count("*").cast("long").alias("n_events"),
        F.max(
            F.struct(
                F.col("_ts").alias("t"),
                F.col("_id").alias("i"),
                F.col("_v").alias("v"),
            )
        )["v"].alias("_hour_v"),
    )
    bounds = base.groupBy("user_id").agg(
        F.min(F.date_trunc("hour", F.col("_ts"))).alias("h0"),
        F.max(F.date_trunc("hour", F.col("_ts"))).alias("h1"),
    )
    grid = bounds.select(
        "user_id",
        F.explode(F.expr("sequence(h0, h1, interval 1 hour)")).alias(
            "hour_ts"
        ),
    )
    joined = grid.join(hourly, ["user_id", "hour_ts"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour_ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        "user_id",
        "hour_ts",
        F.coalesce(F.col("n_events"), F.lit(0)).cast("long").alias(
            "n_events"
        ),
        F.last("_hour_v", ignorenulls=True).over(w).alias("value_locf"),
    )


def ab_test(
    df: DataFrame,
    seed: str = "ab1",
    expose_event: str = "click",
    convert_event: str = "purchase",
    window_hours: int = 72,
) -> DataFrame:
    """One-row A/B readout: users are assigned to arms by the parity of a
    60-bit md5 word over (seed, user_id) — the deterministic split every
    experimentation pipeline needs so reruns and late-arriving events land
    in the same arm without storing an assignment table. A user is EXPOSED
    at their first `expose_event`; CONVERTED if any `convert_event` lands
    strictly after exposure and within `window_hours` (the attribution
    window — unbounded "ever converted" saturates to rate 1.0 on any
    long-lived user base and the z-score degenerates). Output: per-arm
    user/conversion counts and rates plus the pooled two-proportion
    z-score, all closed-form.

    Scale shape: one filtered groupBy(user_id) for exposures, one
    equi-join of exposures to the purchase stream on user_id, a
    map-side-combinable max() per user, then a single global conditional
    aggregation — no window function, no skew surface beyond the user
    key itself. The md5 arm hash is engine-portable, so the DuckDB
    oracle reproduces the assignment bit-for-bit.
    """
    key = F.md5(
        F.concat(F.lit(seed + "_"), F.col("user_id").cast("string"))
    )
    arm = (F.conv(F.substring(key, 1, 15), 16, 10).cast("long") % 2).alias(
        "arm"
    )
    exposed = (
        df.where(F.col("event_type") == expose_event)
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_exposure"))
    )
    purchases = df.where(F.col("event_type") == convert_event).select(
        "user_id", F.col("ts").alias("p_ts")
    )
    in_window = (
        (F.col("p_ts") > F.col("first_exposure"))
        & (
            F.col("p_ts")
            <= F.col("first_exposure")
            + F.expr(f"INTERVAL {int(window_hours)} HOURS")
        )
    ).cast("long")
    users = (
        exposed.join(purchases, "user_id", "left")
        .groupBy("user_id", "first_exposure")
        .agg(F.coalesce(F.max(in_window), F.lit(0)).alias("conv"))
        .select(arm, "conv")
    )
    agg = users.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_b"),
        F.sum(F.when(F.col("arm") == 0, F.col("conv")).otherwise(0))
        .cast("long")
        .alias("conv_a"),
        F.sum(F.when(F.col("arm") == 1, F.col("conv")).otherwise(0))
        .cast("long")
        .alias("conv_b"),
    )
    p_a = F.col("conv_a") / F.col("n_a")
    p_b = F.col("conv_b") / F.col("n_b")
    pool = (F.col("conv_a") + F.col("conv_b")) / (
        F.col("n_a") + F.col("n_b")
    )
    var = pool * (1 - pool) * (1 / F.col("n_a") + 1 / F.col("n_b"))
    # pooled variance is 0 when EVERY user converts (or none does) —
    # there is no sampling noise to normalize by, so z is defined 0
    z = F.when(var > 0, (p_a - p_b) / F.sqrt(var)).otherwise(F.lit(0.0))
    return agg.select(
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        F.round(p_a, 6).alias("rate_a"),
        F.round(p_b, 6).alias("rate_b"),
        F.round(z, 6).alias("z_score"),
    )


def dow_seasonality(df: DataFrame) -> DataFrame:
    """(dow, n_events, expected, chi2) — day-of-week traffic profile with
    the chi-square statistic against a uniform-week null, the standard
    seasonality smell test before alerting on daily_anomaly-style
    baselines (a high chi2 says "compare to the same weekday", not to
    yesterday). dow follows Spark's dayofweek: 1=Sunday..7=Saturday.

    Scale shape: one map-side-combined groupBy over 7 keys, then the
    7-row result self-aggregates for the total — the second pass is a
    broadcast of a scalar, never a second scan of the events table.
    """
    counts = (
        df.groupBy(F.dayofweek("ts").alias("dow"))
        .agg(F.count("*").cast("long").alias("n_events"))
    )
    totals = counts.agg(
        F.sum("n_events").cast("double").alias("total"),
        F.count("*").cast("double").alias("n_days"),
    )
    joined = counts.crossJoin(F.broadcast(totals))
    exp = F.col("total") / F.col("n_days")
    contrib = (F.col("n_events") - exp) * (F.col("n_events") - exp) / exp
    with_c = joined.select(
        "dow", "n_events", exp.alias("exp"), contrib.alias("contrib")
    )
    chi2 = with_c.agg(F.round(F.sum("contrib"), 6).alias("chi2"))
    return with_c.crossJoin(F.broadcast(chi2)).select(
        "dow",
        "n_events",
        F.round("exp", 6).alias("expected"),
        "chi2",
    )


def event_transitions(df: DataFrame) -> DataFrame:
    """(prev_type, next_type, n_trans, prob) — the first-order Markov
    transition table over each user's event sequence: how often does a
    `click` lead to a `purchase` vs another `click`? The standard input
    for behavioral next-event models and for spotting broken funnels
    (a transition that should exist but never fires). Consecutive pairs
    are formed per user in (ts, event_id) order — event_id breaks
    timestamp ties so reruns are deterministic; each user's final event
    has no successor and emits nothing. prob is row-normalized per
    prev_type.

    Scale shape: one hash shuffle on user_id for the lead() window
    (O(1) state per row, spillable sort), then a map-side-combined
    groupBy over at most |event_types|² keys — the second aggregation
    is tiny no matter the log volume. The per-prev_type normalizer is
    a window over that tiny result, not over the events.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = df.select(
        F.col("event_type").alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
    ).where(F.col("next_type").isNotNull())
    counts = pairs.groupBy("prev_type", "next_type").agg(
        F.count("*").cast("long").alias("n_trans")
    )
    tot = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "next_type",
        "n_trans",
        F.round(F.col("n_trans") / F.sum("n_trans").over(tot), 6).alias(
            "prob"
        ),
    )


def attribution_credit(
    df: DataFrame,
    expose_event: str = "click",
    convert_event: str = "purchase",
    window_hours: int = 72,
) -> DataFrame:
    """(click_date, n_credited_clicks, credited_value) — linear
    multi-touch attribution: every purchase's value is split equally
    across that user's clicks in the preceding `window_hours`, and the
    credit is rolled up to the DAY THE CLICK HAPPENED — the report a
    marketing pipeline actually wants ("what did Tuesday's traffic
    earn?"), as opposed to purchase-day revenue. Purchases with no
    qualifying click carry no credit (they'd be the 'direct' bucket).

    Scale shape: one equi-join purchases×clicks on user_id with the
    time-range predicate applied at join output (fan-out bounded by the
    attribution window — a user contributes at most clicks-in-72h per
    purchase), a count() window keyed by the purchase to compute the
    per-click share, then a tiny per-date rollup. No driver loop, no
    cross join; user_id skew is AQE territory like every other per-user
    operator here.
    """
    purchases = df.where(F.col("event_type") == convert_event).select(
        F.col("user_id"),
        F.col("event_id").alias("p_id"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("p_value"),
    )
    clicks = df.where(F.col("event_type") == expose_event).select(
        F.col("user_id"),
        F.col("ts").alias("c_ts"),
    )
    touched = purchases.join(clicks, "user_id").where(
        (F.col("c_ts") < F.col("p_ts"))
        & (
            F.col("c_ts")
            >= F.col("p_ts") - F.expr(f"INTERVAL {int(window_hours)} HOURS")
        )
    )
    per_purchase = Window.partitionBy("p_id")
    credited = touched.select(
        # string date (repo convention: engine-portable value hash)
        F.to_date("c_ts").cast("string").alias("click_date"),
        (F.col("p_value") / F.count("*").over(per_purchase)).alias("credit"),
    )
    return credited.groupBy("click_date").agg(
        F.count("*").cast("long").alias("n_credited_clicks"),
        F.round(F.sum("credit"), 6).alias("credited_value"),
    )


def decayed_activity(df: DataFrame, half_life_days: float = 7.0) -> DataFrame:
    """(user_id, n_events, decayed_score) — exponentially time-decayed
    activity per user: each event contributes 0.5^(age/half_life) where
    age is measured back from the NEWEST event in the table (data-derived
    anchor — reruns over the same snapshot are bit-identical, no
    wall-clock). The standard recency-weighted engagement score: a user
    with 10 events today outranks one with 100 events a month ago.

    Scale shape: one global max(ts) reduced to a scalar and broadcast
    back (never a second scan parameterized per row), then one
    map-side-combined groupBy(user_id). The decay term is pure codegen
    arithmetic — pow + timestamp subtraction — so the whole thing is two
    narrow aggregations.
    """
    anchor = df.agg(F.max("ts").alias("_anchor"))
    # ltz cast: Spark 4's unix_micros rejects NTZ timestamps; the
    # conversion offset cancels in the subtraction (sessionize precedent)
    age_days = (
        F.unix_micros(F.col("_anchor").cast("timestamp_ltz"))
        - F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    ) / F.lit(86400.0 * 1e6)
    weight = F.pow(F.lit(0.5), age_days / F.lit(float(half_life_days)))
    return (
        df.crossJoin(F.broadcast(anchor))
        .groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum(weight), 6).alias("decayed_score"),
        )
    )


def time_to_convert(
    df: DataFrame,
    from_type: str = "view",
    to_type: str = "purchase",
) -> DataFrame:
    """One row: (n_from_users, n_converted, conv_rate, median_s, p90_s)
    — conversion-latency distribution: per user, the first `from_type`
    event and the first STRICTLY LATER `to_type` event; the delta is
    that user's time-to-convert. Latencies are computed in integer
    microseconds (exact across engines) and reported as interpolated
    second quantiles rounded to 6 decimals.

    Scale: two filtered min-aggregations sharing ONE shuffle on user_id
    (conditional min — never a self-join), then a global percentile over
    the converted-user latency table (one row per converted user, the
    grain every funnel analytics job already materializes).
    """
    firsts = (
        df.where(F.col("event_type").isin(from_type, to_type))
        .groupBy("user_id")
        .agg(
            F.min(
                F.when(
                    F.col("event_type") == from_type,
                    F.unix_micros(F.col("ts").cast("timestamp_ltz")),
                )
            ).alias("first_from"),
        )
    )
    conv = (
        df.where(F.col("event_type") == to_type)
        .select(
            "user_id",
            F.unix_micros(F.col("ts").cast("timestamp_ltz")).alias("to_us"),
        )
        .join(firsts, "user_id")
        .where(
            F.col("first_from").isNotNull()
            & (F.col("to_us") > F.col("first_from"))
        )
        .groupBy("user_id")
        .agg(
            F.min(F.col("to_us") - F.col("first_from")).alias("delta_us")
        )
    )
    base = firsts.where(F.col("first_from").isNotNull())
    return base.agg(F.count("*").alias("n_from_users")).crossJoin(
        conv.agg(
            F.count("*").alias("n_converted"),
            F.round(
                F.expr("percentile(delta_us, 0.5)") / 1e6, 6
            ).alias("median_s"),
            F.round(
                F.expr("percentile(delta_us, 0.9)") / 1e6, 6
            ).alias("p90_s"),
        )
    ).select(
        F.col("n_from_users").cast("long"),
        F.col("n_converted").cast("long"),
        F.round(F.col("n_converted") / F.col("n_from_users"), 6).alias(
            "conv_rate"
        ),
        (F.col("median_s") + 0.0).alias("median_s"),
        (F.col("p90_s") + 0.0).alias("p90_s"),
    )


def cusum_changepoint(df: DataFrame) -> DataFrame:
    """One row: (n_days, total, max_cusum_scaled, alarm_date) — one-sided
    CUSUM drift detection on the daily event-count series (Page 1954,
    public knowledge): S_d = max(0, S_{d-1} + (x_d - mean)), alarm at the
    day where S peaks. To keep the recursion exact across engines the
    residual is scaled by n_days: r_d = n_days * x_d - total (integer),
    so max_cusum_scaled is in units of count x n_days and mean never
    becomes a float. Ties on the peak go to the earliest day.

    Scale: the recursion runs over the DAILY grain — a bounded-domain
    array fold (365 elements a year), never over events; the only
    data-sized work is the per-day count shuffle.
    """
    daily = df.groupBy(F.to_date("ts").alias("d")).agg(
        F.count("*").alias("x")
    )
    series = daily.agg(
        F.sort_array(F.collect_list(F.struct("d", "x"))).alias("s"),
        F.count("*").alias("n_days"),
        F.sum("x").alias("total"),
    )
    fold = F.aggregate(
        F.col("s"),
        F.struct(
            F.lit(0).cast("long").alias("cur"),
            F.lit(0).cast("long").alias("best"),
            F.lit(None).cast("date").alias("best_d"),
        ),
        lambda acc, e: F.struct(
            F.greatest(
                F.lit(0).cast("long"),
                acc["cur"] + F.col("n_days") * e["x"] - F.col("total"),
            ).alias("cur"),
            F.when(
                F.greatest(
                    F.lit(0).cast("long"),
                    acc["cur"] + F.col("n_days") * e["x"] - F.col("total"),
                )
                > acc["best"],
                F.greatest(
                    F.lit(0).cast("long"),
                    acc["cur"] + F.col("n_days") * e["x"] - F.col("total"),
                ),
            ).otherwise(acc["best"]).alias("best"),
            F.when(
                F.greatest(
                    F.lit(0).cast("long"),
                    acc["cur"] + F.col("n_days") * e["x"] - F.col("total"),
                )
                > acc["best"],
                e["d"],
            ).otherwise(acc["best_d"]).alias("best_d"),
        ),
    )
    return series.select(
        F.col("n_days").cast("long"),
        F.col("total").cast("long"),
        fold["best"].alias("max_cusum_scaled"),
        # string, not date: the cross-engine comparison canonicalizes
        # dates differently (date vs midnight timestamp)
        fold["best_d"].cast("string").alias("alarm_date"),
    )


def event_paths(df: DataFrame, top_k: int = 10) -> DataFrame:
    """(rank, path, n) — the top_k most common 3-step event-type paths
    across users ('view>click>purchase' style), ordered by count desc
    then path asc. The product-analytics Sankey feed; event_transitions
    is the 1-step (Markov) twin. One window shuffle on user_id, one
    count shuffle on the path string.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trip = df.select(
        F.col("event_type").alias("e0"),
        F.lead("event_type", 1).over(w).alias("e1"),
        F.lead("event_type", 2).over(w).alias("e2"),
    ).where(F.col("e1").isNotNull() & F.col("e2").isNotNull())
    counts = trip.groupBy(
        F.concat_ws(">", "e0", "e1", "e2").alias("path")
    ).agg(F.count("*").alias("n"))
    wr = Window.orderBy(F.col("n").desc(), F.col("path"))
    return (
        counts.withColumn("rank", F.row_number().over(wr))
        .where(F.col("rank") <= top_k)
        .select("rank", "path", F.col("n").cast("long"))
    )


def rfm_segments(df: DataFrame, tiers: int = 5) -> DataFrame:
    """(r_tier, f_tier, m_tier, n_users, total_cents) — RFM customer
    segmentation over purchase events: per user, Recency = whole days
    from their last purchase to the corpus's latest purchase, Frequency
    = purchase count, Monetary = value summed in integer CENTS (exact —
    a float sum would make near-tie orderings engine-dependent). Each
    dimension is ntile(`tiers`)-bucketed under a fully deterministic
    order (metric, then user_id), tier 1 best (most recent / most
    frequent / highest spend). Output is the segment rollup.

    Scale: one shuffle on user_id for the per-user rollup; each tier is
    an EXACT ntile computed without any global window — a
    range-partitioned row_number (ranking.scalable_row_number: broadcast
    percentile_approx cut points, per-bucket windows, bucket-offset
    cumsum) plus the closed-form ntile map from (rank, total) — so the
    user table never funnels through one task even at 10^9+ users,
    while the output stays bit-identical to ntile-over-global-window
    (same oracle).
    """
    from .ranking import multi_scalable_row_number, ntile_from_rank
    us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    per_user = (
        df.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.max(us).alias("last_us"),
            F.count("*").alias("freq"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                "cents"
            ),
        )
    )
    ref = per_user.agg(F.max("last_us").alias("ref_us"))
    per_user = per_user.crossJoin(F.broadcast(ref)).withColumn(
        "recency_days",
        ((F.col("ref_us") - F.col("last_us")) / F.lit(86400_000_000))
        .cast("long"),
    )
    # one materialization of the user rollup, then the FUSED
    # three-dimension rank (ranking.multi_scalable_row_number): all
    # three percentile_approx cut arrays in ONE aggregate pass, ranks
    # landing as columns via per-bucket windows + broadcast offset
    # joins — no per-dimension join back on user_id. (Chaining three
    # independent scalable_row_number calls re-derived the events
    # aggregation 3^3 times pre-checkpoint; the r3 independent-joins
    # shape fixed that but paid 3 cut scans + 3 user-keyed joins — 17
    # shuffles for three numbers per user.)
    per_user = per_user.localCheckpoint(eager=True)
    tot = per_user.agg(F.count("*").cast("long").alias("_n"))
    ranked = multi_scalable_row_number(
        per_user,
        [
            ("recency_days", ["user_id"], True, "_rr"),
            ("freq", ["user_id"], False, "_rf"),
            ("cents", ["user_id"], False, "_rm"),
        ],
    )
    tiered = (
        ranked.select("user_id", "cents", "_rr", "_rf", "_rm")
        .crossJoin(F.broadcast(tot))
        .select(
            "user_id",
            "cents",
            ntile_from_rank(F.col("_rr"), F.col("_n"), tiers).alias("r_tier"),
            ntile_from_rank(F.col("_rf"), F.col("_n"), tiers).alias("f_tier"),
            ntile_from_rank(F.col("_rm"), F.col("_n"), tiers).alias("m_tier"),
        )
    )
    return tiered.groupBy("r_tier", "f_tier", "m_tier").agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum("cents").cast("long").alias("total_cents"),
    )


def synthesize_bot_traffic(df: DataFrame, period: int = 37) -> DataFrame:
    """events with deterministic bot users injected: users with
    user_id % period == 0 get their timestamps rewritten to a dense
    half-second cadence (base 2024-01-01, rank within user) — the
    superhuman-rate traffic a bot detector must flag; everyone else
    keeps their organic timing."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    base_us = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in micros
    rn = F.row_number().over(w)
    bot_us = F.lit(base_us) + (rn - 1).cast("long") * 500_000
    nat_us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    return df.withColumn(
        "ts_us",
        F.when(F.col("user_id") % period == 0, bot_us).otherwise(nat_us),
    )


def bot_detect(
    df: DataFrame,
    min_events: int = 10,
    max_avg_gap_s: int = 5,
) -> DataFrame:
    """(user_id, n_events, span_us, min_gap_us) — rate-based bot
    detection, bots only: a user with >= min_events whose events span
    less than (n_events - 1) * max_avg_gap_s seconds (average gap under
    the human floor) is flagged. All-integer microsecond arithmetic
    (span < (n-1) * gap * 1e6 — cross-multiplied, no division), so the
    cross-engine check is exact.

    Scale: one lag window + one aggregate, both keyed by user_id — a
    single hash shuffle; per-user state is O(1).
    """
    w = Window.partitionBy("user_id").orderBy("ts_us")
    gap = F.col("ts_us") - F.lag("ts_us").over(w)
    per_user = (
        df.withColumn("_gap", gap)
        .groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            (F.max("ts_us") - F.min("ts_us")).cast("long").alias("span_us"),
            F.min("_gap").cast("long").alias("min_gap_us"),
        )
    )
    return per_user.where(
        (F.col("n_events") >= min_events)
        & (
            F.col("span_us")
            < (F.col("n_events") - 1) * max_avg_gap_s * 1_000_000
        )
    )


def anomaly_mad(df: DataFrame, k: int = 5) -> DataFrame:
    """(event_type, n, med, mad, n_outliers) — robust outlier counting
    per event type: median absolute deviation instead of stddev (one
    giant value cannot inflate its own threshold), outlier when
    |value - median| > k * MAD. The robust-statistics twin of
    daily_anomaly's z-score.

    Scale: two exact-percentile passes per group (median, then MAD) —
    at 10^12 rows you'd swap percentile for the GK sketch
    (approx_value_quantiles shows that path); exactness wins here.
    """
    med = df.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = df.join(F.broadcast(med), "event_type").withColumn(
        "_ad", F.abs(F.col("value") - F.col("med"))
    )
    stats = dev.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.max("med").alias("_med"),
        F.expr("percentile(_ad, 0.5)").alias("_mad"),
    )
    outliers = (
        dev.join(
            F.broadcast(stats.select("event_type", "_mad")), "event_type"
        )
        .where(F.col("_ad") > k * F.col("_mad"))
        .groupBy("event_type")
        .agg(F.count("*").cast("long").alias("n_outliers"))
    )
    return (
        stats.join(outliers, "event_type", "left")
        .select(
            "event_type",
            "n",
            F.round("_med", 6).alias("med"),
            F.round("_mad", 6).alias("mad"),
            F.coalesce("n_outliers", F.lit(0))
            .cast("long")
            .alias("n_outliers"),
        )
    )


def value_histogram(df: DataFrame, n_buckets: int = 10) -> DataFrame:
    """(bucket, lo, hi, n) — equi-width histogram of event values over
    [min, max]: bucket = min(n_buckets - 1, floor((v - lo) * n /
    (hi - lo))), so the top edge closes the last bucket. The ingest
    dashboard's distribution panel (value_quantiles is the percentile
    twin). Bucket edges are reported rounded; bucket ASSIGNMENT uses the
    raw doubles, identically on both engines.

    Scale: one global min/max aggregate (broadcast), then one bucket
    count — two passes, no window, no sort.
    """
    mm = df.agg(
        F.min("value").alias("_lo"), F.max("value").alias("_hi")
    )
    b = df.crossJoin(F.broadcast(mm)).select(
        F.least(
            F.lit(n_buckets - 1),
            F.floor(
                (F.col("value") - F.col("_lo"))
                * n_buckets
                / (F.col("_hi") - F.col("_lo"))
            ),
        )
        .cast("int")
        .alias("bucket"),
        "_lo",
        "_hi",
    )
    return b.groupBy("bucket").agg(
        F.round(
            F.max("_lo")
            + F.col("bucket") * (F.max("_hi") - F.max("_lo")) / n_buckets,
            6,
        ).alias("lo"),
        F.round(
            F.max("_lo")
            + (F.col("bucket") + 1)
            * (F.max("_hi") - F.max("_lo"))
            / n_buckets,
            6,
        ).alias("hi"),
        F.count("*").cast("long").alias("n"),
    )


def event_rle(df: DataFrame) -> DataFrame:
    """(user_id, n_events, n_runs, longest_run, compress_ratio) —
    run-length profile of each user's event-type sequence (ts then
    event_id order): highly repetitive streams (the same event fired in
    long runs) compress far below 1.0 and are the replay/automation
    smell complementary to bot_detect's timing signal. compress_ratio =
    n_runs / n_events, rounded.

    Scale: one lag window + two aggregates, all keyed by user_id — a
    single shuffle.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = df.withColumn(
        "_new",
        (
            F.lag("event_type").over(w).isNull()
            | (F.col("event_type") != F.lag("event_type").over(w))
        ).cast("int"),
    ).withColumn(
        "_run",
        F.sum("_new").over(
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    runs = marked.groupBy("user_id", "_run").agg(
        F.count("*").alias("_rl")
    )
    return runs.groupBy("user_id").agg(
        F.sum("_rl").cast("long").alias("n_events"),
        F.count("*").cast("long").alias("n_runs"),
        F.max("_rl").cast("long").alias("longest_run"),
        F.round(F.count("*") / F.sum("_rl"), 6).alias("compress_ratio"),
    )


def dau_wau_stickiness(df: DataFrame, window_days: int = 7) -> DataFrame:
    """(day, dau, wau, stickiness) — per-day distinct active users, the
    trailing `window_days`-day distinct-user count, and the DAU/WAU
    stickiness ratio (6 dp). Only days with at least one event appear.

    Physical shape: distinct (day, user) inventory (map-side partial
    distinct; the shuffle carries one row per user-day, not per event) ->
    each user-day EXPLODED to the `window_days` trailing windows it
    contributes to (constant fan-out, no theta/range join) -> per-day
    distinct aggregate, filtered back to observed days. Sliding distinct
    counts cannot be windowed directly (distinct doesn't decompose);
    the constant-fan-out explode is the scalable rewrite — shuffle volume
    is window_days x |user-days|, independent of raw event count."""
    act = df.select(
        F.to_date("ts").alias("day"), F.col("user_id")
    ).distinct()
    dau = act.groupBy("day").agg(F.count_distinct("user_id").alias("dau"))
    contrib = act.select(
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), window_days - 1))
        ).alias("day"),
        "user_id",
    )
    wau = contrib.groupBy("day").agg(
        F.count_distinct("user_id").alias("wau")
    )
    return (
        dau.join(wau, "day")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("dau").cast("long").alias("dau"),
            F.col("wau").cast("long").alias("wau"),
            F.round(F.col("dau") / F.col("wau"), 6).alias("stickiness"),
        )
    )


def gini_value(df: DataFrame) -> DataFrame:
    """(event_type, n_values, total_value, gini) — Gini coefficient of the
    non-null `value` distribution within each event type: how concentrated
    spend/latency is on a few events. Formula over ascending-sorted x with
    1-based rank i: G = 2*sum(i*x_i) / (n*sum(x)) - (n+1)/n; degenerate
    groups (sum == 0 or n == 1) report 0. Rank ties share a value, and
    sum(i*x_i) over a run of equal x is invariant to the tie order, so the
    result is deterministic without a tiebreaker column.

    Physical shape: one window pass (row_number per type over value
    order) + one aggregate — a single event-type hash shuffle; the sort is
    the window's spillable partition sort. Five event types means five
    partitions: at corpus scale the type key is LOW-cardinality, so this
    op deliberately accepts the per-type sort (the alternative — a
    value-histogram approximation — trades exactness for parallelism;
    value_histogram covers that path)."""
    vals = df.where(F.col("value").isNotNull()).select("event_type", "value")
    w = Window.partitionBy("event_type").orderBy("value")
    ranked = vals.withColumn("i", F.row_number().over(w))
    return (
        ranked.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_values"),
            F.sum("value").alias("_tot"),
            F.sum(F.col("i") * F.col("value")).alias("_iws"),
        )
        .select(
            "event_type",
            "n_values",
            F.round("_tot", 6).alias("total_value"),
            F.when(
                (F.col("_tot") <= 0) | (F.col("n_values") <= 1), F.lit(0.0)
            )
            .otherwise(
                F.round(
                    2.0 * F.col("_iws") / (F.col("n_values") * F.col("_tot"))
                    - (F.col("n_values") + 1) / F.col("n_values"),
                    6,
                )
            )
            .alias("gini"),
        )
    )


def user_entropy(df: DataFrame) -> DataFrame:
    """(user_id, n_events, n_types, entropy) — Shannon entropy (bits) of
    each user's event-type distribution: a behavioral-diversity signal
    (entropy 0 = single-type bots, high entropy = organic browsing; the
    bot_detect op uses periodicity, this uses the type mix). 6 dp.

    Physical shape: (user, type) count aggregate -> per-user rollup — two
    hash shuffles, both map-side combined; entropy is computed from exact
    integer counts, so the only float work is the final log2 ratio."""
    counts = df.groupBy("user_id", "event_type").agg(
        F.count("*").alias("c")
    )
    return (
        counts.groupBy("user_id")
        .agg(
            F.sum("c").cast("long").alias("n_events"),
            F.count("*").cast("long").alias("n_types"),
            F.round(
                F.log2(F.sum("c"))
                - F.sum(F.col("c") * F.log2("c")) / F.sum("c"),
                6,
            ).alias("entropy"),
        )
    )


def ewma_daily(df: DataFrame, alpha: float = 0.3, span: int = 14) -> DataFrame:
    """(day, n_events, ewma, ratio) — exponentially weighted moving
    average of the daily event count over a TRUNCATED `span`-day window
    with weights (1-alpha)^age renormalized over the days actually
    present. ratio = n / ewma (spike detector input). 6 dp.

    The textbook recursive EWMA (s_t = a*c_t + (1-a)*s_{t-1}) is
    sequential, and its closed form needs (1-a)^(-t) terms that overflow
    after a few thousand days — both are non-starters for a distributed
    multi-year log. Truncating at `span` days keeps every weight in
    [(1-a)^(span-1), 1], makes the op a constant-fan-out self-join on the
    day key (each day joins its trailing window), and loses only the
    (1-a)^span ~ 0.7^14 < 1% weight tail.

    Physical shape: daily-count aggregate (one date shuffle) -> trailing
    window via explode of the next `span` days each count contributes to
    (same rewrite as dau_wau_stickiness — constant fan-out, no range
    join) -> weighted per-day rollup, filtered to observed days."""
    daily = df.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").alias("n")
    )
    contrib = daily.select(
        F.col("day").alias("src"),
        "n",
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), span - 1))
        ).alias("day"),
    ).withColumn("age", F.datediff("day", "src"))
    weighted = contrib.groupBy("day").agg(
        F.sum(F.col("n") * F.pow(F.lit(1.0 - alpha), F.col("age"))).alias(
            "_ws"
        ),
        F.sum(F.pow(F.lit(1.0 - alpha), F.col("age"))).alias("_w"),
    )
    return (
        daily.join(weighted, "day")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("n").cast("long").alias("n_events"),
            F.round(F.col("_ws") / F.col("_w"), 6).alias("ewma"),
            F.round(F.col("n") / (F.col("_ws") / F.col("_w")), 6).alias(
                "ratio"
            ),
        )
    )


def events_cube(df: DataFrame) -> DataFrame:
    """(event_type, dow, n, total_value, gid) — CUBE over (event type,
    day-of-week): every cell, both one-dimension subtotals, and the grand
    total in ONE shuffle pass, disambiguated by the grouping-id bitmask
    (0 = cell, 1 = dow rolled up, 2 = type rolled up, 3 = grand total).
    The GROUPING SETS companion to events_rollup (which only covers the
    hierarchical prefix sets). dow is Spark's dayofweek (Sunday = 1).

    Scale note: CUBE expands each input row to the 4 grouping sets
    map-side and partially aggregates BEFORE the exchange, so the shuffle
    carries at most 4x the distinct-cell count — not 4x the data. That
    plan (Expand -> partial HashAggregate -> exchange) is exactly what a
    hand-built union-of-aggregates would cost in four passes, done in
    one."""
    ev = df.select(
        F.coalesce("event_type", F.lit("unknown")).alias("event_type"),
        F.dayofweek("ts").cast("int").alias("dow"),
        "value",
    )
    return ev.cube("event_type", "dow").agg(
        F.count("*").cast("long").alias("n"),
        F.round(F.coalesce(F.sum("value"), F.lit(0.0)), 4).alias(
            "total_value"
        ),
        F.grouping_id().cast("long").alias("gid"),
    )


def seasonal_decompose(df: DataFrame, period_days: int = 7) -> DataFrame:
    """(day, n_events, trend, seasonal_idx, residual) — classic
    multiplicative decomposition of the daily event count: trend = the
    centered `period_days`-day moving average (renormalized over the days
    actually present), seasonal_idx = the mean n/trend ratio of the day's
    weekday across the whole series, residual = n / (trend *
    seasonal_idx). The anomaly detectors (daily_anomaly, anomaly_mad)
    flag deviations; this explains the systematic part they must NOT
    flag. 6 dp.

    Physical shape: daily-count aggregate -> centered window via the same
    constant-fan-out explode as ewma_daily (each day contributes to the
    period_days days centered on it — no range join) -> per-weekday
    seasonal aggregate (7 rows, broadcast back) -> final projection. The
    only non-constant shuffle keys are calendar dates."""
    half = period_days // 2
    daily = df.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").alias("n")
    )
    contrib = daily.select(
        F.col("day").alias("src"),
        "n",
        F.explode(
            F.sequence(
                F.date_sub(F.col("day"), half),
                F.date_add(F.col("day"), half),
            )
        ).alias("day"),
    )
    trend = contrib.groupBy("day").agg(
        (F.sum("n") / F.count("*")).alias("trend")
    )
    based = daily.join(trend, "day").withColumn(
        "dow", F.dayofweek("day")
    )
    seas = based.groupBy("dow").agg(
        F.avg(F.col("n") / F.col("trend")).alias("seasonal_idx")
    )
    return (
        based.join(F.broadcast(seas), "dow")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("n").cast("long").alias("n_events"),
            F.round("trend", 6).alias("trend"),
            F.round("seasonal_idx", 6).alias("seasonal_idx"),
            F.round(
                F.col("n") / (F.col("trend") * F.col("seasonal_idx")), 6
            ).alias("residual"),
        )
    )


def churn_detect(
    df: DataFrame, horizon_days: int = 7, min_events: int = 3
) -> DataFrame:
    """(user_id, n_events, last_day, churned) — inactivity churn flags:
    a user is churned when their last event is more than `horizon_days`
    before the snapshot anchor (the corpus max timestamp) AND they had at
    least `min_events` events (one-shot visitors are noise, not churn).

    Physical shape: one per-user rollup; the anchor rides in as a
    broadcast 1-row max — no second scan, no driver collect."""
    anchor = df.agg(F.max("ts").alias("_a"))
    per_user = df.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_events"),
        F.max("ts").alias("_last"),
    )
    return per_user.crossJoin(F.broadcast(anchor)).select(
        "user_id",
        "n_events",
        F.date_format(F.to_date("_last"), "yyyy-MM-dd").alias("last_day"),
        (
            (F.col("_last") < F.col("_a") - F.expr(
                f"INTERVAL {horizon_days} DAYS"
            ))
            & (F.col("n_events") >= min_events)
        ).alias("churned"),
    )


def robust_value_stats(df: DataFrame, trim: float = 0.1) -> DataFrame:
    """(event_type, n_values, trimmed_mean, winsor_mean) — outlier-robust
    value statistics per event type: the `trim`-fraction trimmed mean
    (drop floor(n*trim) rows from each tail) and the winsorized mean
    (clamp those tails to the surviving extremes). Rank ties break on
    event_id, so both statistics are deterministic. 6 dp; groups where
    trimming would drop everything fall back to the plain mean.

    Physical shape: one row_number window per event type (low-cardinality
    partitions, spillable sort) feeding a conditional aggregate — the
    trim boundaries are computed from count(*) OVER the same partition,
    so there is exactly ONE shuffle on the type key and no self-join."""
    from pyspark.sql import Window

    vals = df.where(F.col("value").isNotNull()).select(
        "event_type", "value", "event_id"
    )
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wc = Window.partitionBy("event_type")
    ranked = vals.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wc).alias("n"),
    ).withColumn("k", F.floor(F.col("n") * trim).cast("long"))
    kept = F.col("rn").between(F.col("k") + 1, F.col("n") - F.col("k"))
    return (
        ranked.groupBy("event_type")
        .agg(
            F.max("n").cast("long").alias("n_values"),
            F.round(
                F.coalesce(
                    F.avg(F.when(kept, F.col("value"))), F.avg("value")
                ),
                6,
            ).alias("trimmed_mean"),
            F.round(
                F.coalesce(
                    (
                        F.sum(F.when(kept, F.col("value")))
                        + F.max("k") * F.min(F.when(kept, F.col("value")))
                        + F.max("k") * F.max(F.when(kept, F.col("value")))
                    )
                    / F.max("n"),
                    F.avg("value"),
                ),
                6,
            ).alias("winsor_mean"),
        )
    )


def wow_growth(df: DataFrame) -> DataFrame:
    """(event_type, week, n, prev_n, growth) — week-over-week event-count
    growth per type: weekly counts (ISO Monday week start via date_trunc),
    the previous OBSERVED week's count, and the growth ratio n/prev
    (null on the first observed week — semantically "no baseline", not
    zero growth). 6 dp.

    Physical shape: one (type, week) aggregate, one lag window over the
    tiny weekly rollup — the window never touches event rows."""
    from pyspark.sql import Window

    weekly = df.groupBy(
        F.col("event_type"),
        F.date_format(F.date_trunc("week", F.col("ts")), "yyyy-MM-dd").alias(
            "week"
        ),
    ).agg(F.count("*").cast("long").alias("n"))
    w = Window.partitionBy("event_type").orderBy("week")
    return weekly.select(
        "event_type",
        "week",
        "n",
        F.lag("n").over(w).alias("prev_n"),
        F.round(F.col("n") / F.lag("n").over(w), 6).alias("growth"),
    )


def interarrival_hist(df: DataFrame) -> DataFrame:
    """(event_type, bucket, n, min_gap_s, max_gap_s) — log2-bucketed
    inter-arrival-gap histogram per event type: gap = seconds since the
    type's previous event (global per type, the arrival-process view —
    sessionize covers the per-user view), bucket = floor(log2(gap + 1)).
    The burstiness/arrival-rate profile that sizes streaming watermarks
    and micro-batch triggers. Gaps are exact microsecond differences;
    3 dp on the min/max.

    Physical shape: ONE event-type window pass for the lag (low-
    cardinality partitions, spillable sort), then a (type, bucket)
    aggregate with map-side combine over the lag output."""
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    gaps = (
        df.withColumn(
            "gap_s",
            (us - F.lag(us).over(w)) / F.lit(1_000_000.0),
        )
        .where(F.col("gap_s").isNotNull())
        .withColumn(
            "bucket", F.floor(F.log2(F.col("gap_s") + 1)).cast("int")
        )
    )
    return gaps.groupBy("event_type", "bucket").agg(
        F.count("*").cast("long").alias("n"),
        F.round(F.min("gap_s"), 3).alias("min_gap_s"),
        F.round(F.max("gap_s"), 3).alias("max_gap_s"),
    )


def _markov_transitions(df: DataFrame) -> DataFrame:
    """(a, b, c) lag-pair transition counts of the per-user event-type
    chain — the ONE corpus window pass shared by markov_stationary and
    markov_entropy_rate (checkpointed by the entropy composition so the
    corpus is scanned once, the tiny states x states table many times)."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        df.withColumn("nxt", F.lead("event_type").over(w))
        .where(F.col("nxt").isNotNull())
        .groupBy(F.col("event_type").alias("a"), F.col("nxt").alias("b"))
        .agg(F.count("*").alias("c"))
    )


def markov_stationary(
    df: DataFrame, iters: int = 3, pairs: "DataFrame | None" = None,
    states: "DataFrame | None" = None,
) -> DataFrame:
    """(event_type, pi) — approximate stationary distribution of the
    per-user event-type Markov chain: transition counts from lag pairs
    (the event_transitions surface), row-normalized, then `iters` power
    iterations pi <- pi P from the uniform start. Where users spend
    their long-run attention — the steady-state complement of the
    one-step transition view. States without outgoing transitions keep
    their mass (self-loop convention, keeps pi a distribution). 6 dp.

    Physical shape: ONE corpus window pass builds the transition counts,
    eagerly checkpointed with the states frame (when not supplied by the
    caller) before the power iteration: pi_k references pi_{k-1} twice
    (moved + kept-sink mass), so the PLAN doubles per iteration, and
    without the checkpoint the duplicated subtrees compiled to a
    108-exchange plan whose Catalyst analysis dominated wall time — the
    checkpointed form re-measured 2.6x faster warm at sf0.1 (the same
    reversal markov_entropy_rate saw; an earlier round measured lazy
    sharing ahead on a smaller plan, so this is a MEASURED trade, not a
    rule). `pairs`/`states` accept shared frames so compositions
    (markov_entropy_rate) hand both consumers the same materialized
    tables."""
    if pairs is None:
        pairs = _markov_transitions(df).localCheckpoint(eager=True)
    outs = pairs.groupBy("a").agg(F.sum("c").alias("tot"))
    P = pairs.join(outs, "a").select(
        "a", "b", (F.col("c") / F.col("tot")).alias("p")
    )
    if states is None:
        states = (
            df.select(F.col("event_type").alias("s"))
            .where(F.col("s").isNotNull())
            .distinct()
            .localCheckpoint(eager=True)
        )
    n_states = states.agg(F.count("*").cast("double").alias("_n"))
    pi = states.crossJoin(F.broadcast(n_states)).select(
        "s", (F.lit(1.0) / F.col("_n")).alias("pi")
    )
    sinks = states.join(
        P.select(F.col("a").alias("s")).distinct(), "s", "left_anti"
    ).withColumn("_sink", F.lit(True))
    for _ in range(iters):
        moved = (
            P.join(pi.withColumnRenamed("s", "a"), "a")
            .groupBy(F.col("b").alias("s"))
            .agg(F.sum(F.col("p") * F.col("pi")).alias("m"))
        )
        kept = pi.join(sinks.select("s"), "s", "leftsemi").select(
            "s", F.col("pi").alias("k")
        )
        # pi_k is referenced TWICE by pi_{k+1} (moved + kept sink mass),
        # so an untruncated plan doubles per iteration — 2^iters copies
        # of the join graph (90+ exchanges / 58 checkpoint scans audited
        # at iters=3 even with the corpus subtree truncated). A LAZY
        # localCheckpoint each step keeps the plan constant-size per
        # iteration without adding a per-step job barrier (eager
        # re-measured ~0.2s slower at sf0.1: three sequential tiny jobs
        # cost more than one fused run of the truncated graph); the
        # materialized table is bounded by the event-type domain.
        pi = (
            states.join(moved, "s", "left")
            .join(kept, "s", "left")
            .select(
                "s",
                (
                    F.coalesce("m", F.lit(0.0)) + F.coalesce("k", F.lit(0.0))
                ).alias("pi"),
            )
            .localCheckpoint(eager=False)
        )
    return pi.select(
        F.col("s").alias("event_type"), F.round("pi", 6).alias("pi")
    )


def kaplan_meier(df: DataFrame) -> DataFrame:
    """(t_hours, n_risk, d_events, survival) — Kaplan-Meier estimate of
    time-to-first-purchase: per user, duration = hours (floored) from
    their first event to their first purchase (converted) or to their
    last event (right-censored). One row per distinct CONVERSION time:
    at-risk count (duration >= t), conversions at t, and the product-
    limit survival S(t) = prod_{t_j <= t} (1 - d_j / n_j). The censoring-
    aware answer to "how fast do users convert" that a plain average of
    converted users biases. 6 dp.

    Physical shape: one user rollup (first/purchase/last timestamps),
    a duration histogram, then the KM curve assembled on the DISTINCT-
    time table: at-risk via a running sum over the descending-time
    histogram, the product limit via exp(sum(ln)) windows — the
    sequential-looking cumulative product is two window passes over a
    table bounded by distinct durations, never user rows."""
    from pyspark.sql import Window

    us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    per_user = df.groupBy("user_id").agg(
        F.min(us).alias("t0"),
        F.min(
            F.when(F.col("event_type") == "purchase", us)
        ).alias("tp"),
        F.max(us).alias("tl"),
    )
    durs = per_user.select(
        F.floor(
            (F.coalesce("tp", "tl") - F.col("t0")) / F.lit(3600.0 * 1e6)
        ).cast("long").alias("t"),
        F.col("tp").isNotNull().alias("ev"),
    )
    hist = durs.groupBy("t").agg(
        F.count("*").alias("n_all"),
        F.sum(F.col("ev").cast("long")).alias("d"),
    )
    w_desc = Window.orderBy(F.desc("t")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    at_risk = hist.withColumn("n_risk", F.sum("n_all").over(w_desc))
    ev_times = at_risk.where(F.col("d") > 0)
    w_asc = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    factor = 1 - F.col("d") / F.col("n_risk")
    km = (
        ev_times.withColumn(
            "_lnf", F.when(factor > 0, F.log(factor)).otherwise(F.lit(None))
        )
        .withColumn("_zeros", F.sum((factor <= 0).cast("long")).over(w_asc))
        .withColumn(
            "survival",
            F.when(F.col("_zeros") > 0, F.lit(0.0)).otherwise(
                F.exp(F.sum("_lnf").over(w_asc))
            ),
        )
    )
    return km.select(
        F.col("t").alias("t_hours"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d").cast("long").alias("d_events"),
        F.round("survival", 6).alias("survival"),
    )


def dow_hour_heatmap(df: DataFrame) -> DataFrame:
    """(dow, hour, n, share) — the calendar heatmap behind every traffic
    dashboard: event counts per (day-of-week, hour-of-day) cell with the
    global share (6 dp). dow is Spark's dayofweek (Sunday = 1). One
    map-side-combined aggregate; the share denominator rides as a window
    sum over the <= 168-cell result."""
    from pyspark.sql import Window

    hist = df.groupBy(
        F.dayofweek("ts").cast("int").alias("dow"),
        F.hour("ts").cast("int").alias("hour"),
    ).agg(F.count("*").cast("long").alias("n"))
    w = Window.partitionBy()
    return hist.select(
        "dow",
        "hour",
        "n",
        F.round(F.col("n") / F.sum("n").over(w), 6).alias("share"),
    )


def autocorrelation(df: DataFrame, lags: "tuple[int, ...]" = (1, 7, 14)) -> DataFrame:
    """(lag, n_pairs, acf) — Pearson autocorrelation of the daily event
    count at the given lags: acf(7) ~ 1 flags weekly periodicity (the
    seasonality detector feeding seasonal_decompose's period choice),
    acf(1) measures day-to-day persistence. Pairs are (day, day+lag)
    where BOTH days exist; 6 dp; lags with < 3 pairs or zero variance
    report null.

    Physical shape: daily rollup once, then one self-equi-join per lag on
    the shifted date key (calendar-sized frames) and a corr aggregate —
    no window over event rows."""
    daily = df.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").cast("double").alias("n")
    )
    outs = []
    for lag in lags:
        j = daily.alias("a").join(
            daily.alias("b"),
            F.expr(f"date_add(a.day, {lag})") == F.col("b.day"),
        )
        outs.append(
            j.agg(
                F.lit(lag).cast("int").alias("lag"),
                F.count("*").cast("long").alias("n_pairs"),
                F.when(
                    F.count("*") >= 3,
                    F.round(F.corr(F.col("a.n"), F.col("b.n")), 6),
                ).alias("acf"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def event_trigrams(df: DataFrame, top_k: int = 20) -> DataFrame:
    """(e1, e2, e3, n) — the `top_k` most frequent length-3 consecutive
    event-type sequences across user streams (ties broken by the
    sequence itself): the behavioral-motif miner between
    event_transitions (length 2) and event_paths (whole truncated
    paths). 

    Physical shape: one user window pass (two leads share the single
    (user, ts) sort), a map-side-combined trigram count, and a global
    TakeOrderedAndProject for the top-k — k rows cross the final
    boundary."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tri = (
        df.withColumn("e2", F.lead("event_type", 1).over(w))
        .withColumn("e3", F.lead("event_type", 2).over(w))
        .where(F.col("e2").isNotNull() & F.col("e3").isNotNull())
        .groupBy(
            F.col("event_type").alias("e1"), "e2", "e3"
        )
        .agg(F.count("*").cast("long").alias("n"))
    )
    return tri.orderBy(
        F.desc("n"), "e1", "e2", "e3"
    ).limit(top_k)


def markov_entropy_rate(df: DataFrame, iters: int = 3) -> DataFrame:
    """One row (n_states, entropy_rate, perplexity) — entropy rate of the
    per-user event-type Markov chain: H = -sum_a pi_a sum_b P_ab ln P_ab
    with pi from markov_stationary (same `iters` approximation) — nats
    per step, plus e^H as the effective branching factor. How
    predictable the average next event is, weighted by where users
    actually spend time; sink states (no outgoing transitions, modeled
    as self-loops) contribute zero entropy. 6 dp.

    Physical shape: ONE corpus window pass for the transition counts,
    eagerly checkpointed (with the states frame) before the power
    iteration — the unrolled iters x joins then run over two tiny
    materialized tables instead of re-deriving the corpus window per
    branch. The r3 lazy-shared form compiled to a 115-exchange plan
    whose Catalyst analysis dominated wall time; measured at sf0.1 the
    checkpointed shape is 1.4x faster warm and 3.3x cold, identical
    output."""
    pairs = _markov_transitions(df).localCheckpoint(eager=True)
    states = (
        df.select(F.col("event_type").alias("s"))
        .where(F.col("s").isNotNull())
        .distinct()
        .localCheckpoint(eager=True)
    )
    outs = pairs.groupBy("a").agg(F.sum("c").alias("tot"))
    row_h = (
        pairs.join(outs, "a")
        .groupBy("a")
        .agg(
            (
                -F.sum(
                    (F.col("c") / F.col("tot"))
                    * F.log(F.col("c") / F.col("tot"))
                )
            ).alias("h")
        )
    )
    pi = markov_stationary(df, iters=iters, pairs=pairs, states=states).select(
        F.col("event_type").alias("a"), "pi"
    )
    out = pi.join(row_h, "a", "left").agg(
        F.count("*").cast("long").alias("n_states"),
        F.sum(F.col("pi") * F.coalesce("h", F.lit(0.0))).alias("_H"),
    )
    return out.select(
        "n_states",
        F.round("_H", 6).alias("entropy_rate"),
        F.round(F.exp("_H"), 6).alias("perplexity"),
    )
