"""Analytics/query operators — the dashboard's "SQL" (SURVEY.md §2.7).

Pure built-in Catalyst territory: filters push to the parquet scan, top-k
compiles to TakeOrderedAndProject, aggregates are partial (map-side) before
the shuffle. Written over any metrics-shaped DataFrame; the driver's `events`
table is the stand-in at test scale, the pipeline's own metrics table is the
production input.

Reference provenance per function in docstrings (analytics.py /
gui/dashboard_panel.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def load_analytics_logs(spark, log_dir: str) -> DataFrame:
    """Analytics log scan (analytics.py:19-46): read every JSON log in the
    dir; batch logs carry their per-doc records nested under `details` —
    flatten them into the same record stream as single-doc logs
    (analytics.py:33-40). One distributed json read + explode; the
    reference's driver-side loop over files disappears into scan splits."""
    raw = spark.read.option("multiLine", True).json(log_dir)
    cols = set(raw.columns)
    doc_cols = [c for c in ("pdf_path", "doc_type", "success", "confidence",
                            "timestamp", "processing_time", "error")
                if c in cols]
    singles = (
        raw.filter(F.col("details").isNull()) if "details" in cols else raw
    ).select(*doc_cols)
    if "details" not in cols:
        return singles
    nested = (
        raw.filter(F.col("details").isNotNull())
        .select(F.explode("details").alias("d"))
        .select("d.*")
    )
    # align schemas (a nested record may lack some top-level fields) — the
    # filler must take the SINGLES side's dtype: a hardcoded string cast
    # would make unionByName silently widen e.g. success(boolean) or
    # confidence(double) to string for the whole result, breaking typed
    # aggregates downstream (round-1 advice)
    for c in doc_cols:
        if c not in nested.columns:
            nested = nested.withColumn(
                c, F.lit(None).cast(singles.schema[c].dataType)
            )
    return singles.unionByName(nested.select(*doc_cols))


def filtered(
    df: DataFrame,
    ts_col: str = "timestamp",
    start=None,
    end=None,
    type_col: str = "doc_type",
    doc_type: str | None = None,
) -> DataFrame:
    """Range + equality filter (analytics.py:61-86)."""
    out = df
    if start is not None:
        out = out.filter(F.col(ts_col) >= F.lit(start))
    if end is not None:
        out = out.filter(F.col(ts_col) <= F.lit(end))
    if doc_type is not None:
        out = out.filter(F.col(type_col) == doc_type)
    return out


def distinct_types(df: DataFrame, type_col: str = "doc_type") -> DataFrame:
    """Unique non-null types, sorted (analytics.py:52-59)."""
    return (
        df.select(type_col)
        .where(F.col(type_col).isNotNull())
        .distinct()
        .orderBy(type_col)
    )


def success_rate(df: DataFrame, success_col: Column) -> DataFrame:
    """sum(success)/n * 100, 0 on empty (analytics.py:88-96)."""
    return df.agg(
        F.round(
            F.coalesce(F.avg(success_col.cast("double")) * 100, F.lit(0.0)), 4
        ).alias("success_rate")
    )


def avg_confidence(df: DataFrame, conf_col: str = "confidence") -> DataFrame:
    """Mean counting only records that HAVE the key — Spark avg ignores
    nulls, which matches (analytics.py:98-107)."""
    return df.agg(F.round(F.avg(conf_col), 6).alias("avg_confidence"))


def count_by_date(df: DataFrame, ts_col: str = "timestamp") -> DataFrame:
    """Count per %Y-%m-%d, sorted by date (analytics.py:109-132)."""
    return (
        df.groupBy(F.to_date(ts_col).alias("date"))
        .agg(F.count("*").alias("count"))
        .orderBy("date")
    )


def count_by_type(
    df: DataFrame, type_col: str = "doc_type", unknown: str = "Desconhecido"
) -> DataFrame:
    """Count per type (null -> 'Desconhecido'), desc (analytics.py:134-152).
    Ties broken by type name so output order is deterministic."""
    return (
        df.groupBy(F.coalesce(F.col(type_col), F.lit(unknown)).alias("doc_type"))
        .agg(F.count("*").alias("count"))
        .orderBy(F.desc("count"), "doc_type")
    )


def kpis(
    df: DataFrame, success_col: Column, ts_col: str = "timestamp",
    today: str | None = None, time_col: str | None = None,
) -> DataFrame:
    """Dashboard KPI row, all FOUR cells (gui/dashboard_panel.py:236-270):
    total count, success rate, docs 'today', and avg processing time with
    the reference's ms/s/min display tiers ('-' when no time column or no
    values, :267-270). `today` is injected for determinism (the GUI uses
    the wall clock)."""
    today_cnt = (
        F.sum((F.to_date(ts_col) == F.lit(today).cast("date")).cast("long"))
        if today is not None
        else F.lit(0).cast("long")
    )
    avg_time_display = (
        format_time_tiers(F.avg(time_col))
        if time_col is not None
        else F.coalesce(F.first(F.lit("-")), F.lit("-"))
    )
    return df.agg(
        F.count("*").alias("total_docs"),
        F.round(F.coalesce(F.avg(success_col.cast("double")) * 100, F.lit(0.0)), 4)
        .alias("success_rate"),
        F.coalesce(today_cnt, F.lit(0).cast("long")).alias("docs_today"),
        avg_time_display.alias("avg_time_display"),
    )


def format_time_tiers(avg_time: Column) -> Column:
    """ms / s / min display tiers (gui/dashboard_panel.py:259-266):
    <1s -> '{t*1000:.0f}ms', <60s -> '{t:.1f}s', else '{t/60:.1f}min';
    null avg (no values) -> '-' (:267-270)."""
    return (
        F.when(avg_time.isNull(), F.lit("-"))
        .when(
            avg_time < 1,
            F.concat(F.round(avg_time * 1000, 0).cast("long"), F.lit("ms")),
        )
        .when(avg_time < 60, F.concat(F.format_string("%.1f", avg_time), F.lit("s")))
        .otherwise(
            F.concat(F.format_string("%.1f", avg_time / 60), F.lit("min"))
        )
    )


def avg_time_kpi(df: DataFrame, time_col: str = "processing_time") -> DataFrame:
    """Average processing time with display formatting
    (gui/dashboard_panel.py:256-266); avg ignores nulls like the
    reference's 'if processing_time in d' filter."""
    return df.agg(
        F.round(F.avg(time_col), 6).alias("avg_time"),
        format_time_tiers(F.avg(time_col)).alias("avg_time_display"),
    )


def densified_daily_counts(
    df: DataFrame, start: str, end: str, ts_col: str = "timestamp"
) -> DataFrame:
    """Counts reindexed over the full date range, missing days = 0
    (gui/dashboard_panel.py:283-286): explode sequence(start, end, 1 day),
    left join daily counts, coalesce 0. The calendar side is tiny ->
    broadcast; counts side is pre-aggregated before the join."""
    spark = df.sparkSession
    days = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(start).cast("date"),
                F.lit(end).cast("date"),
                F.expr("interval 1 day"),
            )
        ).alias("date")
    )
    counts = (
        df.filter(
            (F.to_date(ts_col) >= F.lit(start)) & (F.to_date(ts_col) <= F.lit(end))
        )
        .groupBy(F.to_date(ts_col).alias("date"))
        .agg(F.count("*").alias("cnt"))
    )
    return (
        days.join(counts, "date", "left")
        .select("date", F.coalesce("cnt", F.lit(0)).alias("count"))
        .orderBy("date")
    )


def grouped_mean(
    df: DataFrame, type_col: str = "doc_type", value_col: str = "confidence"
) -> DataFrame:
    """Mean value per type, desc (gui/dashboard_panel.py:326-339)."""
    return (
        df.groupBy(type_col)
        .agg(F.round(F.avg(value_col), 6).alias("avg_value"))
        .orderBy(F.desc("avg_value"), type_col)
    )


def top_k(
    df: DataFrame, col: str, k: int = 10, alias: str | None = None
) -> DataFrame:
    """Top-k values by count (gui/dashboard_panel.py:348-356); name tiebreak
    for determinism. orderBy+limit compiles to TakeOrderedAndProject."""
    alias = alias or col
    return (
        df.where(F.col(col).isNotNull())
        .groupBy(F.col(col).alias(alias))
        .agg(F.count("*").alias("count"))
        .orderBy(F.desc("count"), alias)
        .limit(k)
    )


def most_recent(
    df: DataFrame, ts_col: str, n: int = 20, tiebreak: str | None = None
) -> DataFrame:
    """N most recent records (gui/dashboard_panel.py:376-380) —
    TakeOrderedAndProject, never a global sort."""
    order = [F.desc(ts_col)] + ([F.desc(tiebreak)] if tiebreak else [])
    return df.orderBy(*order).limit(n)


def props_variant_stats(events: DataFrame) -> DataFrame:
    """(event_type, n, min_k, max_k, avg_k) — typed aggregation over the
    semi-structured props column via Spark 4 VARIANT: parse_json once at
    the scan, then variant_get path extraction. At 10^12 rows this is the
    right shape for JSON-bearing columns — the binary variant encoding is
    parsed once and every downstream path probe is a cheap typed access,
    where per-path get_json_object re-parses the string each time (the
    public Spark 4 semi-structured data story). Missing/null/MALFORMED
    props drop out of the typed aggregate as NULLs, never as errors
    (try_parse_json for malformed JSON, try_variant_get for wrong-typed
    values — a crawl-scale log always contains junk rows)."""
    v = events.select(
        "event_type", F.try_parse_json(F.col("props")).alias("v")
    )
    k = F.expr("try_variant_get(v, '$.k', 'long')")
    return (
        v.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").cast("long").alias("n"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.round(F.avg("k"), 6).alias("avg_k"),
        )
        .orderBy("event_type")
    )


def order_deciles(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """(segment, decile, n_orders, min_price, max_price, avg_price) —
    order-value decile bands per market segment: ntile(10) over
    (o_totalprice, o_orderkey) — the orderkey tiebreaker makes the tiling
    deterministic under equal prices — then per-band stats. The
    "where do the big orders sit per segment" distribution view. 2 dp.

    Physical shape: orders ⋈ customer on custkey (the dimension side is
    segment-only and AQE/broadcast-eligible), ONE segment-key window for
    the tiling, one aggregate. Segments are LOW cardinality, so window
    partitions are few and large — the spillable-sort profile — while the
    aggregate is map-side combined. At 10^12 orders the exact global
    tiling per segment is the honest cost of exact deciles; the
    approx-quantile path (value_quantiles/approx_value_quantiles) is the
    documented alternative when rank exactness can be traded away."""
    from pyspark.sql import Window

    j = orders.join(
        F.broadcast(customer.select("c_custkey", "c_mktsegment")),
        orders["o_custkey"] == customer["c_custkey"],
    ).select(
        F.col("c_mktsegment").alias("segment"),
        "o_totalprice",
        "o_orderkey",
    )
    w = Window.partitionBy("segment").orderBy("o_totalprice", "o_orderkey")
    tiled = j.withColumn("decile", F.ntile(10).over(w))
    return tiled.groupBy("segment", "decile").agg(
        F.count("*").cast("long").alias("n_orders"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
        F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
    )


def part_affinity(
    lineitem: DataFrame, min_pairs: int = 2
) -> DataFrame:
    """(part_a, part_b, pair_n, n_a, n_b, lift) — market-basket affinity
    between parts over orders: for every unordered part pair co-occurring
    in at least `min_pairs` orders, the co-occurrence count, each part's
    order frequency, and the lift P(a,b)·N / (P(a)·P(b)) (4 dp). The
    TPC-H-relational twin of assoc_rules (which mines event props).

    Physical shape: distinct (order, part) inventory -> self-equi-join ON
    THE ORDER KEY with part_a < part_b — fan-out is bounded by per-order
    basket size (TPC-H ~4 items), never corpus-wide — -> pair aggregate
    with map-side combine, pruned by min_pairs BEFORE the two
    vocabulary-sized frequency joins (both broadcast-eligible). The order
    count rides in as a broadcast 1-row aggregate."""
    inv = lineitem.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    ).distinct()
    n_orders = inv.select("ok").distinct().agg(
        F.count("*").cast("double").alias("_N")
    )
    pairs = (
        inv.alias("a")
        .join(inv.alias("b"), "ok")
        .where(F.col("a.pk") < F.col("b.pk"))
        .groupBy(
            F.col("a.pk").alias("part_a"), F.col("b.pk").alias("part_b")
        )
        .agg(F.count("*").cast("long").alias("pair_n"))
        .where(F.col("pair_n") >= min_pairs)
    )
    # part-frequency joins are part-dictionary-sized: NOT force-broadcast
    # (at 10^12 lineitems the part dictionary is billions of rows); AQE
    # elects broadcast when it fits
    freq = inv.groupBy("pk").agg(F.count("*").cast("long").alias("n"))
    return (
        pairs.join(
            freq.select(F.col("pk").alias("part_a"), F.col("n").alias("n_a")),
            "part_a",
        )
        .join(
            freq.select(F.col("pk").alias("part_b"), F.col("n").alias("n_b")),
            "part_b",
        )
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            "pair_n",
            "n_a",
            "n_b",
            F.round(
                F.col("pair_n") * F.col("_N") / (F.col("n_a") * F.col("n_b")),
                4,
            ).alias("lift"),
        )
    )


def mutual_information(
    df: DataFrame, col_x: str, col_y: str
) -> DataFrame:
    """One row (n, h_x, h_y, mi, nmi) — mutual information (nats) between
    two categorical columns with marginal entropies and the
    sqrt-normalized NMI. The dataset-audit statistic behind "is language
    confounded with source?" — a high NMI means a per-source split leaks
    language (or vice versa) into train/eval. Degenerate case (either
    entropy 0) reports nmi 0. 6 dp.

    Physical shape: one joint-count aggregate (map-side combined), the
    marginals re-aggregated FROM the joint table (category-pairs-sized,
    tiny), a final 1-row rollup. All counts exact integers; only the
    final ln is float."""
    joint = (
        df.where(F.col(col_x).isNotNull() & F.col(col_y).isNotNull())
        .groupBy(F.col(col_x).alias("x"), F.col(col_y).alias("y"))
        .agg(F.count("*").alias("c"))
    )
    from pyspark.sql import Window

    wx = Window.partitionBy("x")
    wy = Window.partitionBy("y")
    wall = Window.partitionBy()
    t = (
        joint.withColumn("nx", F.sum("c").over(wx))
        .withColumn("ny", F.sum("c").over(wy))
        .withColumn("n", F.sum("c").over(wall))
    )
    mi = F.sum(
        (F.col("c") / F.col("n"))
        * F.log(F.col("c") * F.col("n") / (F.col("nx") * F.col("ny")))
    )
    # marginal entropies from the joint table: sum over x of nx ln nx
    # counts each x once per y — divide by the per-x duplication via
    # distinct-aggregated expressions instead: H = ln N - sum(nx ln nx)/N
    # computed on the DISTINCT margins
    hx = F.log(F.max("n")) - F.sum(
        F.when(F.col("_rx") == 1, F.col("nx") * F.log("nx")).otherwise(0.0)
    ) / F.max("n")
    hy = F.log(F.max("n")) - F.sum(
        F.when(F.col("_ry") == 1, F.col("ny") * F.log("ny")).otherwise(0.0)
    ) / F.max("n")
    t = t.withColumn(
        "_rx", F.row_number().over(wx.orderBy("y"))
    ).withColumn("_ry", F.row_number().over(wy.orderBy("x")))
    out = t.agg(
        F.max("n").cast("long").alias("n"),
        F.round(hx, 6).alias("h_x"),
        F.round(hy, 6).alias("h_y"),
        F.round(mi, 6).alias("mi"),
        (hx * hy).alias("_hh"),
        mi.alias("_mi_raw"),
    )
    return out.select(
        "n",
        "h_x",
        "h_y",
        "mi",
        F.round(
            F.when(F.col("_hh") <= 0, F.lit(0.0)).otherwise(
                F.col("_mi_raw") / F.sqrt("_hh")
            ),
            6,
        ).alias("nmi"),
    )


def shipping_delay_stats(
    lineitem: DataFrame, orders: DataFrame
) -> DataFrame:
    """(priority, n, avg_delay, median_delay, p90_delay) — order-to-ship
    latency per order priority: delay = datediff(l_shipdate,
    o_orderdate). Exact percentiles via Spark's `percentile` aggregate —
    linear interpolation on the sorted values, the same contract as
    DuckDB's quantile_cont, so the oracle matches bit-for-bit modulo the
    6-dp round.

    Physical shape: fact ⋈ fact equi-join on the order key (both sides
    shuffle — co-bucketing by orderkey is the production layout that
    removes it), then exact grouped percentiles sorting within each
    (low-cardinality) priority partition — the honest exact path; the
    approx_percentile twin (approx_value_quantiles) is the documented
    trade when group cardinality or skew makes full sorts
    unreasonable."""
    d = lineitem.join(
        orders.select("o_orderkey", "o_orderdate", "o_orderpriority"),
        lineitem["l_orderkey"] == orders["o_orderkey"],
    ).select(
        F.col("o_orderpriority").alias("priority"),
        F.datediff("l_shipdate", "o_orderdate").alias("delay"),
    )
    return d.groupBy("priority").agg(
        F.count("*").cast("long").alias("n"),
        F.round(F.avg("delay"), 6).alias("avg_delay"),
        F.round(F.expr("percentile(delay, 0.5)"), 6).alias("median_delay"),
        F.round(F.expr("percentile(delay, 0.9)"), 6).alias("p90_delay"),
    )


def discount_revenue_curve(lineitem: DataFrame) -> DataFrame:
    """(discount, n_items, qty, revenue, avg_item_revenue) — revenue
    response per discount level (the TPC-H q6 question generalized from a
    band filter to the whole curve): revenue = extendedprice * (1 -
    discount), grouped by the discount level (2 dp — TPC-H discounts are
    already 2-dp levels). One map-side-combined aggregate, no joins."""
    return (
        lineitem.groupBy(F.round("l_discount", 2).alias("discount"))
        .agg(
            F.count("*").cast("long").alias("n_items"),
            F.round(F.sum("l_quantity"), 2).alias("qty"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.round(
                F.avg(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("avg_item_revenue"),
        )
    )


def regional_top_parts(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    top_k: int = 3,
) -> DataFrame:
    """(region, rank, part_key, revenue) — top-k parts by discounted
    revenue within each customer region: the star-join + per-group top-k
    shape every BI layer runs hourly. Ties break on part key. 2 dp.

    Physical shape: fact ⋈ fact on the order key (the one big shuffle),
    dimensions (customer -> nation -> region) folded in as broadcast
    joins BEFORE the aggregate so the revenue rollup happens once per
    (region, part) — low cardinality — and the rank window runs over the
    rollup, never over fact rows."""
    from pyspark.sql import Window

    dim = (
        customer.join(
            F.broadcast(nation.select("n_nationkey", "n_regionkey")),
            customer["c_nationkey"] == nation["n_nationkey"],
        )
        .join(
            F.broadcast(region.select("r_regionkey", "r_name")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("c_custkey", F.col("r_name").alias("region"))
    )
    rev = (
        lineitem.join(
            orders.select("o_orderkey", "o_custkey"),
            lineitem["l_orderkey"] == orders["o_orderkey"],
        )
        .join(F.broadcast(dim), F.col("o_custkey") == dim["c_custkey"])
        .groupBy("region", F.col("l_partkey").alias("part_key"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                2,
            ).alias("revenue")
        )
    )
    w = Window.partitionBy("region").orderBy(
        F.desc("revenue"), F.asc("part_key")
    )
    return (
        rev.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select("region", F.col("rank").cast("int").alias("rank"),
                "part_key", "revenue")
    )


def null_profile(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(column, n_rows, n_null, n_blank, pct_missing) — per-column
    completeness audit over the STRING columns of a table: nulls,
    blank-after-trim values, and the combined missing share (6 dp). The
    ingest-contract check that runs before anything else in a pipeline.

    Physical shape: ONE pass — per-column conditional aggregates in a
    single agg (no unpivot shuffle, no per-column scans), reshaped to
    rows with a literal stack. Output height = #columns."""
    scols = [
        f.name
        for f in df.schema.fields
        if f.dataType.simpleString() == "string"
    ]
    aggs = []
    for c in scols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"_n_{c}"))
        aggs.append(
            F.sum(
                (F.col(c).isNotNull() & (F.trim(F.col(c)) == "")).cast("long")
            ).alias(f"_b_{c}")
        )
    wide = df.agg(F.count("*").alias("_rows"), *aggs)
    stacked = wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col("_rows").alias("n_rows"),
                        F.col(f"_n_{c}").alias("n_null"),
                        F.col(f"_b_{c}").alias("n_blank"),
                    )
                    for c in scols
                ]
            )
        ).alias("s")
    ).select("s.*")
    return stacked.select(
        "column",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_null").cast("long").alias("n_null"),
        F.col("n_blank").cast("long").alias("n_blank"),
        F.round(
            (F.col("n_null") + F.col("n_blank")) / F.col("n_rows"), 6
        ).alias("pct_missing"),
    )


def benford_deviation(orders: DataFrame) -> DataFrame:
    """(digit, n, observed, expected, chi_contrib) — first-significant-
    digit distribution of order totals vs Benford's law
    (P(d) = log10(1 + 1/d)) with per-digit chi-square contributions. The
    books-cooked tripwire for any value column whose magnitudes span
    orders of magnitude. 6 dp.

    Physical shape: one digit aggregate (map-side combined) over a pure
    string projection; the total rides as a window sum over the 9-row
    histogram."""
    from pyspark.sql import Window

    d = orders.where(F.col("o_totalprice") > 0).select(
        F.substring(
            F.regexp_replace(
                F.format_number(F.col("o_totalprice"), 6), "[^1-9]", ""
            ),
            1,
            1,
        )
        .cast("int")
        .alias("digit")
    )
    hist = d.where(F.col("digit").isNotNull()).groupBy("digit").agg(
        F.count("*").cast("long").alias("n")
    )
    w = Window.partitionBy()
    tot = F.sum("n").over(w)
    obs = F.col("n") / tot
    exp = F.log10(1 + 1 / F.col("digit"))
    return hist.select(
        "digit",
        "n",
        F.round(obs, 6).alias("observed"),
        F.round(exp, 6).alias("expected"),
        F.round(tot * (obs - exp) * (obs - exp) / exp, 6).alias(
            "chi_contrib"
        ),
    )


def bootstrap_ci(
    df: DataFrame,
    b: int = 200,
    lo: float = 0.025,
    hi: float = 0.975,
) -> DataFrame:
    """One row (n, b, mean, lo95, hi95) — Poisson-bootstrap confidence
    interval for the event success rate (share of non-error events). The
    error-bar every dashboard number needs: B replicate means from
    per-(row, replicate) Poisson(1) weights, interval = interpolated
    quantiles of the replicate means. 6 dp.

    Deterministic by construction: ONE 60-bit md5 uniform per ROW, and
    replicate b's uniform is the Weyl/golden-ratio shift
    frac(h + phi*b) — uniform marginals, independent ACROSS rows within
    every replicate (which is what the replicate mean needs), identical
    IEEE doubles in any engine, so the WHOLE interval is oracle-
    checkable. The per-cell-md5 alternative is statistically cleaner
    (replicates fully independent) but costs B md5+base-conversions per
    row — measured 18.6s vs ~2s at sf0.1; the Weyl coupling across
    replicates only perturbs the quantile-of-means estimate
    (antithetic-like), not the means themselves. Poisson bootstrap (not
    multinomial) is the distributed-data standard (per-row independence
    -> map-side expansion, no global resample pass); weights cap at 5
    (P(>5) < 1e-4 — negligible and keeps the CASE ladder finite).

    Physical shape: explode rows x B (constant fan-out B; everything
    after the one md5 is whole-stage-codegen double math), ONE replicate
    aggregate with map-side combine (B partial rows per mapper), then
    exact interpolated quantiles over the B-row replicate table."""
    x = F.when(F.col("event_type") != "error", 1.0).otherwise(0.0)
    h = (
        F.conv(
            F.substring(F.md5(F.col("event_id").cast("string")), 1, 15),
            16,
            10,
        ).cast("double")
        / F.lit(float(1 << 60))
    )
    base = df.select(F.col("event_id"), x.alias("x"), h.alias("h"))
    expanded = base.select(
        "h", "x", F.explode(F.sequence(F.lit(0), F.lit(b - 1))).alias("rb")
    )
    phi = 0.6180339887498949
    raw = F.col("h") + F.lit(phi) * F.col("rb")
    u = raw - F.floor(raw)
    # Poisson(1) inverse CDF, cumulative thresholds e^-1 * sum(1/k!)
    w = (
        F.when(u < 0.3678794411714423, 0)
        .when(u < 0.7357588823428846, 1)
        .when(u < 0.9196986029286058, 2)
        .when(u < 0.9810118431238462, 3)
        .when(u < 0.9963401531726563, 4)
        .otherwise(5)
    )
    reps = (
        expanded.withColumn("w", w)
        .groupBy("rb")
        .agg(
            F.sum("w").alias("wn"),
            F.sum(F.col("w") * F.col("x")).alias("wx"),
        )
        .select((F.col("wx") / F.col("wn")).alias("m"))
    )
    stats = df.agg(
        F.count("*").cast("long").alias("n"),
        F.round(
            F.avg(F.when(F.col("event_type") != "error", 1.0).otherwise(0.0)),
            6,
        ).alias("mean"),
    )
    ci = reps.agg(
        F.round(F.expr(f"percentile(m, {lo})"), 6).alias("lo95"),
        F.round(F.expr(f"percentile(m, {hi})"), 6).alias("hi95"),
    )
    return (
        stats.crossJoin(F.broadcast(ci))
        .select("n", F.lit(b).cast("long").alias("b"), "mean", "lo95", "hi95")
    )


def dp_counts(
    df: DataFrame,
    group_col: str = "event_type",
    epsilon: float = 1.0,
    seed: str = "dp0",
) -> DataFrame:
    """(group, true_n, noise, noisy_n, epsilon) — epsilon-DP count release
    plumbing: per-group counts + Laplace(1/epsilon) noise via the inverse
    CDF. Counting queries have sensitivity 1, so scale b = 1/epsilon.
    The pipeline-side mechanics (per-release seed, epsilon accounting
    column, post-processing floor at 0) are the real part; the noise
    draw here is DETERMINISTIC from md5(seed:group) so the whole release
    is oracle-checkable — a production release swaps exactly this one
    uniform for a secure RNG, which is the only line that must differ.
    6 dp.

    Physical shape: one count aggregate; noise is a projection over the
    groups-sized result."""
    counts = df.where(F.col(group_col).isNotNull()).groupBy(
        F.col(group_col).alias("grp")
    ).agg(F.count("*").cast("long").alias("true_n"))
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(seed + ":"), F.col("grp"))), 1, 15
            ),
            16,
            10,
        ).cast("double")
        / F.lit(float(1 << 60))
        - 0.5
    )
    # Laplace inverse CDF: -b * sign(u) * ln(1 - 2|u|)
    b = 1.0 / epsilon
    noise = -F.lit(b) * F.signum(u) * F.log(1 - 2 * F.abs(u))
    return counts.select(
        F.col("grp").alias("group"),
        "true_n",
        F.round(noise, 6).alias("noise"),
        F.greatest(
            F.round(F.col("true_n") + noise, 6), F.lit(0.0)
        ).alias("noisy_n"),
        F.lit(float(epsilon)).alias("epsilon"),
    )


def join_size_estimate(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    top_frequent: int = 16,
) -> DataFrame:
    """One row (actual_pairs, est_pairs, est_err_pct, left_keys,
    right_keys, top_key_share) — planner-style equi-join cardinality
    diagnostics: the EXACT join output size sum(c_l(k) * c_r(k))
    computed from the two key histograms (never materializing the join),
    the uniform-frequency estimate |L|*|R|/max(ndv) a naive planner
    would use, its signed error, and the share of true output owned by
    the `top_frequent` heaviest keys (the skew-explains-the-error
    readout). 6 dp.

    Physical shape: two per-key count aggregates, one histogram-sized
    join — the 'actual' is exact but costs histograms, not the join
    itself. The top-share uses a bounded sort over the joined histogram
    (top_frequent rows cross no boundary; it's a window-free
    TakeOrdered pattern folded into the aggregate via sort+limit)."""
    hl = left.groupBy(F.col(left_key).alias("k")).agg(
        F.count("*").alias("cl")
    )
    hr = right.groupBy(F.col(right_key).alias("k")).agg(
        F.count("*").alias("cr")
    )
    j = hl.join(hr, "k").select(
        "k", (F.col("cl") * F.col("cr")).alias("pairs")
    )
    top = (
        j.orderBy(F.desc("pairs"), F.asc("k"))
        .limit(top_frequent)
        .agg(F.sum("pairs").alias("top_pairs"))
    )
    stats = (
        hl.agg(
            F.sum("cl").alias("nl"), F.count("*").alias("ndv_l")
        )
        .crossJoin(hr.agg(F.sum("cr").alias("nr"), F.count("*").alias("ndv_r")))
        .crossJoin(j.agg(F.coalesce(F.sum("pairs"), F.lit(0)).alias("actual")))
        .crossJoin(F.broadcast(top))
    )
    est = F.col("nl") * F.col("nr") / F.greatest("ndv_l", "ndv_r")
    return stats.select(
        F.col("actual").cast("long").alias("actual_pairs"),
        F.round(est, 6).alias("est_pairs"),
        F.round((est - F.col("actual")) / F.col("actual") * 100, 6).alias(
            "est_err_pct"
        ),
        F.col("ndv_l").cast("long").alias("left_keys"),
        F.col("ndv_r").cast("long").alias("right_keys"),
        F.round(
            F.coalesce(F.col("top_pairs"), F.lit(0)) / F.col("actual"), 6
        ).alias("top_key_share"),
    )


def numeric_profile(lineitem: DataFrame) -> DataFrame:
    """(column, n, n_null, ndv, min_v, max_v, mean, std) — per-numeric-
    column profile of the lineitem measures: the ingest-contract /
    near-zero-variance audit that complements null_profile's string-side
    view. Sample standard deviation; 4 dp.

    Physical shape: the moment stats come from ONE non-distinct
    aggregate pass reshaped with a literal stack; the exact distinct
    counts come from a stacked (column, value) explode with map-side
    partial dedup. FOUR `count_distinct`s inside one aggregate would
    instead make Catalyst Expand the input 5x (one replicated scan per
    distinct column — measured 2.3s vs 1.1s at sf0.1); the stacked
    shape shuffles only the per-partition distinct values (tiny for the
    low-cardinality measures) and joins 4 rows back broadcast."""
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    aggs = [F.count("*").alias("_rows")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"_n_{c}"),
            F.round(F.min(c), 4).alias(f"_mi_{c}"),
            F.round(F.max(c), 4).alias(f"_ma_{c}"),
            F.round(F.avg(c), 4).alias(f"_me_{c}"),
            F.round(F.stddev(c), 4).alias(f"_sd_{c}"),
        ]
    wide = lineitem.agg(*aggs)
    stacked = lineitem.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"), F.col(c).alias("v")
                    )
                    for c in cols
                ]
            )
        ).alias("s")
    ).select("s.*")
    ndv = stacked.groupBy("column").agg(
        F.count_distinct("v").alias("_ndv")
    )
    rows = wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col("_rows").cast("long").alias("n"),
                        F.col(f"_n_{c}").cast("long").alias("n_null"),
                        F.col(f"_mi_{c}").alias("min_v"),
                        F.col(f"_ma_{c}").alias("max_v"),
                        F.col(f"_me_{c}").alias("mean"),
                        F.col(f"_sd_{c}").alias("std"),
                    )
                    for c in cols
                ]
            )
        ).alias("s")
    ).select("s.*")
    return rows.join(F.broadcast(ndv), "column").select(
        "column", "n", "n_null", F.col("_ndv").cast("long").alias("ndv"),
        "min_v", "max_v", "mean", "std",
    )


def ks_test(
    df: DataFrame, type_a: str = "purchase", type_b: str = "click"
) -> DataFrame:
    """One row (n_a, n_b, ks_stat, d_crit, reject) — two-sample
    Kolmogorov-Smirnov test between the value distributions of two event
    types: KS = max over observed values of |F_a(v) - F_b(v)|, critical
    value at alpha=0.05 via the asymptotic 1.36*sqrt((n_a+n_b)/(n_a n_b)).
    The distribution-drift tripwire the mean-based ab_test misses. 6 dp.

    Physical shape: per-distinct-value (c_a, c_b) counts (map-side
    combined), then BOTH running sums from one range-partitioned pass
    (ranking.partitioned_rank_and_sums — at continuous 10^12-row scale
    distinct values approach row count, so the value-ordered cumulative
    step must not funnel through a single-task window), and the KS max
    is a plain aggregate."""
    vals = df.where(
        F.col("value").isNotNull()
        & F.col("event_type").isin(type_a, type_b)
    ).select(
        "value",
        (F.col("event_type") == type_a).cast("long").alias("ia"),
        (F.col("event_type") == type_b).cast("long").alias("ib"),
    )
    per_v = vals.groupBy("value").agg(
        F.sum("ia").alias("ca"), F.sum("ib").alias("cb")
    )
    from .ranking import partitioned_rank_and_sums

    cum = partitioned_rank_and_sums(
        per_v, "value", [], val_cols=("ca", "cb"), ascending=True,
        sum_prefix="_f_",
    ).select(F.col("_f_ca").alias("fa"), F.col("_f_cb").alias("fb"))
    return (
        cum.crossJoin(
            F.broadcast(
                vals.agg(
                    F.sum("ia").cast("long").alias("n_a"),
                    F.sum("ib").cast("long").alias("n_b"),
                )
            )
        )
        .agg(
            F.max("n_a").alias("n_a"),
            F.max("n_b").alias("n_b"),
            F.round(
                F.max(
                    F.abs(
                        F.col("fa") / F.col("n_a")
                        - F.col("fb") / F.col("n_b")
                    )
                ),
                6,
            ).alias("ks_stat"),
        )
        .select(
            "n_a",
            "n_b",
            "ks_stat",
            F.round(
                1.36
                * F.sqrt(
                    (F.col("n_a") + F.col("n_b"))
                    / (F.col("n_a") * F.col("n_b"))
                ),
                6,
            ).alias("d_crit"),
        )
        .withColumn("reject", F.col("ks_stat") > F.col("d_crit"))
    )


def psi_drift(df: DataFrame, n_bins: int = 10) -> DataFrame:
    """(bin, n_ref, n_cur, p_ref, p_cur, contrib) — Population Stability
    Index of the event `value` distribution between the FIRST and SECOND
    half of the observed time range: bins are the reference half's
    deciles (interpolated percentiles), both halves are histogrammed
    into them, contrib = (p_cur - p_ref) * ln(p_cur / p_ref) with both
    shares floored at 1e-6 (the standard empty-bin guard; sum of contrib
    is the PSI — > 0.2 conventionally flags drift). The ML-ops drift
    monitor for any scored column. 6 dp.

    Physical shape: one midpoint scalar, one n_bins-1 percentile
    aggregate on the reference half (broadcast as an array literal),
    then bin assignment as a pure aggregate expression over the edge
    array — no join, one (half, bin) count shuffle."""
    mid = df.agg(
        ((F.unix_micros(F.max("ts").cast("timestamp_ltz"))
          + F.unix_micros(F.min("ts").cast("timestamp_ltz"))) / 2
         ).alias("_mid")
    )
    base = (
        df.where(F.col("value").isNotNull())
        .crossJoin(F.broadcast(mid))
        .select(
            "value",
            (
                F.unix_micros(F.col("ts").cast("timestamp_ltz"))
                < F.col("_mid")
            ).alias("is_ref"),
        )
    )
    qs = [i / n_bins for i in range(1, n_bins)]
    edges = base.where("is_ref").agg(
        F.expr(
            "percentile(value, array(" + ",".join(str(q) for q in qs) + "))"
        ).alias("_edges")
    )
    binned = base.crossJoin(F.broadcast(edges)).select(
        "is_ref",
        (
            1
            + F.aggregate(
                "_edges",
                F.lit(0),
                lambda acc, e: acc + (F.col("value") > e).cast("int"),
            )
        ).alias("bin"),
    )
    hist = binned.groupBy("bin").agg(
        F.sum(F.col("is_ref").cast("long")).alias("n_ref"),
        F.sum((~F.col("is_ref")).cast("long")).alias("n_cur"),
    )
    tots = hist.agg(
        F.sum("n_ref").alias("_tr"), F.sum("n_cur").alias("_tc")
    )
    p_ref = F.greatest(F.col("n_ref") / F.col("_tr"), F.lit(1e-6))
    p_cur = F.greatest(F.col("n_cur") / F.col("_tc"), F.lit(1e-6))
    return hist.crossJoin(F.broadcast(tots)).select(
        F.col("bin").cast("int").alias("bin"),
        F.col("n_ref").cast("long").alias("n_ref"),
        F.col("n_cur").cast("long").alias("n_cur"),
        F.round(p_ref, 6).alias("p_ref"),
        F.round(p_cur, 6).alias("p_cur"),
        F.round((p_cur - p_ref) * F.log(p_cur / p_ref), 6).alias("contrib"),
    )


def corr_matrix(lineitem: DataFrame) -> DataFrame:
    """(col_a, col_b, n, pearson) — Pearson correlation for every
    unordered pair of lineitem measures, computed in ONE aggregate pass
    (Spark's corr is the streaming covariance formula; all pairs share
    the scan). The feature-redundancy screen before any modeling step.
    6 dp.

    Physical shape: a single agg with C(4,2) corr accumulators — one
    scan, one 1-row result, reshaped with a literal stack."""
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    pairs = [
        (a, b) for i, a in enumerate(cols) for b in cols[i + 1:]
    ]
    aggs = [F.count("*").alias("_n")] + [
        F.round(F.corr(a, b), 6).alias(f"_c_{a}_{b}") for a, b in pairs
    ]
    wide = lineitem.agg(*aggs)
    return wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(a).alias("col_a"),
                        F.lit(b).alias("col_b"),
                        F.col("_n").cast("long").alias("n"),
                        F.col(f"_c_{a}_{b}").alias("pearson"),
                    )
                    for a, b in pairs
                ]
            )
        ).alias("s")
    ).select("s.*")


def source_trend(df: DataFrame) -> DataFrame:
    """(source, n_days, slope, intercept, r2) — per-source OLS trend of
    daily event counts against the day index (days since the source's
    first active day): the feed-health trend detector ("is this crawl
    source drying up"). Closed-form OLS from the five sums; singleton /
    zero-variance groups report null slope. 6 dp.

    Physical shape: daily rollup -> per-source closed-form aggregate —
    two map-side-combined shuffles, no window, no iteration."""
    from pyspark.sql import Window

    daily = df.groupBy(
        F.col("event_type").alias("source"), F.to_date("ts").alias("day")
    ).agg(F.count("*").cast("double").alias("y"))
    base = daily.withColumn(
        "x",
        F.datediff(
            "day", F.min("day").over(Window.partitionBy("source"))
        ).cast("double"),
    )
    s = base.groupBy("source").agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n = F.col("n_days").cast("double")
    varx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = n * F.col("syy") - F.col("sy") * F.col("sy")
    cov = n * F.col("sxy") - F.col("sx") * F.col("sy")
    slope = F.when(varx > 0, cov / varx)
    intercept = F.when(
        varx > 0, (F.col("sy") - slope * F.col("sx")) / n
    )
    r2 = F.when((varx > 0) & (vary > 0), cov * cov / (varx * vary))
    return s.select(
        "source",
        "n_days",
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
        F.round(r2, 6).alias("r2"),
    )


def dispersion_index(df: DataFrame) -> DataFrame:
    """(event_type, n_users, mean_count, var_count, dispersion,
    overdispersed) — variance-to-mean ratio of per-user event counts per
    type: ~1 under a Poisson arrival model, >> 1 flags bursty/clumped
    usage (bots, batch imports). Population variance; dispersion null
    when the mean is 0. 6 dp.

    Physical shape: (type, user) counts then a per-type moment rollup —
    two map-side-combined shuffles."""
    per_user = df.groupBy("event_type", "user_id").agg(
        F.count("*").cast("double").alias("c")
    )
    s = per_user.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_users"),
        F.avg("c").alias("m"),
        (F.avg(F.col("c") * F.col("c")) - F.avg("c") * F.avg("c")).alias(
            "v"
        ),
    )
    return s.select(
        "event_type",
        "n_users",
        F.round("m", 6).alias("mean_count"),
        F.round("v", 6).alias("var_count"),
        F.round(F.when(F.col("m") > 0, F.col("v") / F.col("m")), 6).alias(
            "dispersion"
        ),
        (F.col("v") / F.col("m") > 1.5).alias("overdispersed"),
    )


def capture_recapture(
    df: DataFrame, type_a: str = "purchase", type_b: str = "click"
) -> DataFrame:
    """One row (n_a, n_b, n_both, estimate, coverage) — Lincoln-Petersen
    capture-recapture estimate of the total user population from two
    independent "sightings" (users seen in each of two event types):
    N_hat = n_a * n_b / n_both, plus the coverage ratio of the users
    actually observed in either. The completeness audit when the true
    population is unobservable (how many users does the log MISS).
    Returns null estimate when the overlap is empty. 2 dp.

    Physical shape: one distinct (type, user) inventory feeding three
    conditional counts in a single aggregate."""
    inv = (
        df.where(F.col("event_type").isin(type_a, type_b))
        .select("event_type", "user_id")
        .distinct()
    )
    per_user = inv.groupBy("user_id").agg(
        F.max((F.col("event_type") == type_a).cast("int")).alias("ia"),
        F.max((F.col("event_type") == type_b).cast("int")).alias("ib"),
    )
    s = per_user.agg(
        F.sum("ia").cast("long").alias("n_a"),
        F.sum("ib").cast("long").alias("n_b"),
        F.sum(F.col("ia") * F.col("ib")).cast("long").alias("n_both"),
        F.count("*").cast("long").alias("n_seen"),
    )
    est = F.when(
        F.col("n_both") > 0,
        F.round(F.col("n_a") * F.col("n_b") / F.col("n_both"), 2),
    )
    return s.select(
        "n_a",
        "n_b",
        "n_both",
        est.alias("estimate"),
        F.round(
            F.when(F.col("n_both") > 0, F.col("n_seen") / est), 4
        ).alias("coverage"),
    )
