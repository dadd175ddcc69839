"""Count-Min Sketch as DataFrame ops — the third mergeable summary next to
HLL (`approx_distinct_users`) and the quantile sketch
(`approx_value_quantiles`).

At 10^12 rows you cannot keep exact per-key counts per shard/day, but a
depth x width cell table (a few KB) per shard merges cell-wise and answers
point frequency queries with est >= exact and
est <= exact + eps * total (eps ~ e/width) at 1 - delta confidence
(delta ~ exp(-depth)) — Cormode & Muthukrishnan's bound.

Everything is deterministic and engine-portable: row hashes are md5-derived
60-bit values (the same `simhash_token_hash` construction DuckDB reproduces
with CAST('0x' || substr(md5(..), 1, 15) AS BIGINT)), so the ENTIRE sketch
— cells and estimates — is SQL-mirrorable and the driver's oracle checks it
exactly, not within tolerance.

Physical shape: building the sketch explodes each row into `depth`
(d, bucket) coordinates (constant fan-out) and partial-aggregates
map-side, so the shuffle carries at most depth x width cells per mapper —
the sketch, not the data. Estimation joins the (small, broadcast) sketch
back to the queried keys and takes min over d.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import simhash_token_hash


def _cms_bucket(key: "F.Column", d: int, width: int) -> "F.Column":
    """Row-d bucket for a key: md5-derived 60-bit hash of 'cms{d}:{key}'
    mod width. Seeding via the prefix keeps the rows independent while
    staying bit-identical in any engine with md5."""
    return simhash_token_hash(
        F.concat(F.lit(f"cms{d}:"), key.cast("string"))
    ) % F.lit(width)


def cms_table(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """(d, bucket, cnt) — the Count-Min cell table for one key column."""
    coords = F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                _cms_bucket(F.col(key_col), d, width).alias("bucket"),
            )
            for d in range(depth)
        ]
    )
    return (
        df.select(F.explode(coords).alias("c"))
        .groupBy(F.col("c.d").alias("d"), F.col("c.bucket").alias("bucket"))
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def cms_estimates(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """(key, exact_n, cms_est) for every distinct key: the sketch estimate
    next to ground truth, est >= exact by construction. The sketch table is
    depth x width rows — broadcast to the keys join regardless of corpus
    size."""
    sketch = cms_table(df, key_col, depth, width)
    keys = (
        df.groupBy(F.col(key_col).alias("key"))
        .agg(F.count("*").cast("long").alias("exact_n"))
    )
    probes = keys.select(
        "key",
        "exact_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _cms_bucket(F.col("key"), d, width).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("p"),
    ).select("key", "exact_n", F.col("p.d").alias("d"), F.col("p.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(sketch), ["d", "bucket"])
        .groupBy("key", "exact_n")
        .agg(F.min("cnt").alias("cms_est"))
    )


def _bloom_probe(key: "F.Column", i: int, bits: int) -> "F.Column":
    return simhash_token_hash(
        F.concat(F.lit(f"bf{i}:"), key.cast("string"))
    ) % F.lit(bits)


def bloom_build(
    df: DataFrame, key_col: str, bits: int = 4096, hashes: int = 5
) -> DataFrame:
    """(word, mask) — a Bloom filter over a key column, packed 63 bits per
    row (bit 63 would overflow a signed left-shift in some engines): at most bits/64 rows regardless of how many keys went in. The
    fixed-size, cell-wise-OR-mergeable set summary: ship an eval set (or
    yesterday's digest index) to every executor as a few KB even when the
    underlying set has 10^9 members. md5-derived probes keep it
    engine-portable (the oracle rebuilds the identical filter)."""
    # pyspark's shiftleft() only takes a literal shift amount; bind the
    # bit position as a column and shift via the SQL expression instead
    return (
        df.select(
            F.explode(
                F.array(
                    *[
                        _bloom_probe(F.col(key_col), i, bits)
                        for i in range(hashes)
                    ]
                )
            ).alias("p")
        )
        .select(
            F.floor(F.col("p") / 63).cast("long").alias("word"),
            (F.col("p") % 63).cast("int").alias("pm"),
        )
        .select(
            "word", F.expr("shiftleft(cast(1 as bigint), pm)").alias("mask")
        )
        .groupBy("word")
        .agg(F.bit_or(F.col("mask")).alias("mask"))
    )


def bloom_member(
    df: DataFrame,
    key_col: str,
    bloom: DataFrame,
    id_col: str,
    bits: int = 4096,
    hashes: int = 5,
) -> DataFrame:
    """(id, bloom_hit) — no-false-negative membership against a
    bloom_build filter: a row hits iff ALL `hashes` probe bits are set.
    The filter is broadcast (bits/64 rows); the corpus side stays put —
    ONE narrow pass plus a per-id aggregate, the decontamination /
    incremental-dedup prefilter shape at corpus scale."""
    probes = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(
                F.array(
                    *[
                        _bloom_probe(F.col(key_col), i, bits)
                        for i in range(hashes)
                    ]
                )
            ).alias("p"),
        )
        .select(
            "id",
            F.floor(F.col("p") / 63).cast("long").alias("word"),
            (F.col("p") % 63).cast("int").alias("pm"),
        )
        .select(
            "id",
            "word",
            F.expr("shiftleft(cast(1 as bigint), pm)").alias("mask"),
        )
    )
    hit = (
        probes.join(
            F.broadcast(bloom.withColumnRenamed("mask", "bmask")),
            "word",
            "left",
        )
        .withColumn(
            "h",
            (
                F.col("mask").bitwiseAND(F.coalesce("bmask", F.lit(0)))
                != 0
            ).cast("int"),
        )
        .groupBy("id")
        .agg((F.min("h") == 1).alias("bloom_hit"))
    )
    return hit


def _sample_hash(id_col: "F.Column") -> "F.Column":
    """60-bit md5-derived row hash ('smp:' seed prefix) — bit-identical in
    DuckDB via CAST('0x' || substr(md5('smp:' || id), 1, 15) AS BIGINT)."""
    return simhash_token_hash(
        F.concat(F.lit("smp:"), id_col.cast("string"))
    )


def sample_sketch(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    k: int = 64,
    prefilter_factor: int = 8,
) -> DataFrame:
    """(g, n, sk) — the fourth mergeable summary next to CMS / HLL /
    Bloom: a deterministic bottom-k-by-hash row sample per group. `sk` is
    the sorted array of the k (hash, value) pairs with the smallest
    60-bit md5 row hashes; `n` is the exact group count. Because bottom-k
    under a global hash ranking is a semilattice, two shard sketches merge
    exactly (`merge_sample_sketches`) into the sketch of the union — the
    per-shard/per-day summary algebra that answers quantile queries at
    10^12 rows without re-scanning (the KMV/bottom-k construction from
    the public sketching literature, with values carried alongside).

    Scale shape mirrors stratified_sample: per-group counts (one
    partial-agg shuffle) -> broadcast hash-space cut keeping
    ~prefilter_factor*k rows per group -> the rank window runs over the
    tiny survivor set, never the corpus, so a giant group cannot funnel
    into one sort partition. md5 uniformity makes per-group shortfall
    (< k survivors) negligible at factor 8, and the DuckDB oracle ranks
    UNFILTERED, so a shortfall fails correctness loudly."""
    base = (
        df.where(F.col(value_col).isNotNull() & F.col(id_col).isNotNull())
        .select(
            F.col(group_col).alias("g"),
            F.col(value_col).cast("double").alias("v"),
            _sample_hash(F.col(id_col)).alias("h"),
        )
    )
    counts = base.groupBy("g").agg(F.count("*").cast("long").alias("n"))
    max_h = float(1 << 60)
    cut = counts.withColumn(
        "h_cut",
        F.when(
            F.col("n") <= F.lit(prefilter_factor * k), F.lit(max_h)
        ).otherwise(
            F.lit(max_h) * F.lit(float(prefilter_factor * k)) / F.col("n")
        ),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("g").orderBy(F.asc("h"), F.asc("v"))
    kept = (
        base.join(F.broadcast(cut), "g")
        .where(F.col("h") <= F.col("h_cut"))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
    )
    return kept.groupBy("g").agg(
        F.first("n").alias("n"),
        F.sort_array(
            F.collect_list(F.struct(F.col("h"), F.col("v")))
        ).alias("sk"),
    )


def merge_sample_sketches(a: "F.Column", b: "F.Column", k: int) -> "F.Column":
    """Exact sketch union: concatenate, re-sort by hash, keep the k
    smallest — bottom-k(shard1 ∪ shard2) == merge(bottom-k(shard1),
    bottom-k(shard2)). Null-safe for groups absent from one shard."""
    empty = F.array().cast("array<struct<h:bigint,v:double>>")
    return F.slice(
        F.sort_array(F.concat(F.coalesce(a, empty), F.coalesce(b, empty))),
        1,
        k,
    )


def sketch_quantile(sk: "F.Column", q: float) -> "F.Column":
    """Quantile estimate from a sample sketch: the floor(q*(m-1))+1-th
    smallest sampled VALUE (m = sketch size). Deterministic order-stat
    indexing (no interpolation) so any engine reproduces it exactly."""
    return F.element_at(
        F.sort_array(F.transform(sk, lambda x: x["v"])),
        (
            F.floor(F.lit(q) * (F.size(sk) - F.lit(1)).cast("double"))
            + F.lit(1)
        ).cast("int"),
    )


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    threshold: int,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """(key, exact_n) for every key occurring >= threshold times — the
    CMS-prefiltered two-pass heavy-hitters pattern. Pass 1 folds the
    stream into the depth x width Count-Min cell table (bounded size at
    ANY key cardinality) and ships it back into the plan as an array
    literal (the hash_lr "model rides the plan" trick — bounded driver
    state, no broadcast join). Pass 2 filters rows MAP-SIDE to those
    whose sketch estimate clears the threshold, then exact-counts only
    the survivors. CMS overestimates, never underestimates, so the
    prefilter has NO false negatives: the output is exactly GROUP BY
    HAVING count >= threshold — which is what the oracle checks, making
    a broken prefilter loudly visible as missing keys.

    Scale shape: at a 10^9-distinct-key space a direct groupBy shuffles
    the whole stream by key; here the only full-stream aggregate is the
    1024-cell sketch (map-side combined into almost nothing), and the
    exact groupBy runs over just the heavy-candidate rows — the rare
    keys the query is about plus sketch-collision stragglers (bounded by
    eps = e/width of stream mass per row).

    NULL keys are excluded (a null hashes to a null bucket — it is not a
    countable identity; a degenerate corpus WILL contain them)."""
    df = df.filter(F.col(key_col).isNotNull())
    sketch = cms_table(df, key_col, depth, width)
    cells = sketch.collect()  # bounded: depth x width rows
    grid = [[0] * width for _ in range(depth)]
    for r in cells:
        grid[r["d"]][int(r["bucket"])] = r["cnt"]
    est = F.least(
        *[
            F.element_at(
                F.array(*[F.lit(c) for c in grid[d]]),
                _cms_bucket(F.col(key_col), d, width).cast("int") + 1,
            )
            for d in range(depth)
        ]
    )
    return (
        df.filter(est >= F.lit(threshold))
        .groupBy(F.col(key_col).alias("key"))
        .agg(F.count("*").cast("long").alias("exact_n"))
        .filter(F.col("exact_n") >= F.lit(threshold))
    )


def kmv_set_cardinality(
    df: DataFrame,
    group_col: str = "event_type",
    key_col: str = "user_id",
    k: int = 64,
) -> DataFrame:
    """(grp_a, grp_b, est_a, est_b, est_union, est_inter) — KMV bottom-k
    distinct-count ALGEBRA between per-group key sets: cardinality of each
    set, of the union (merge sketches, re-take bottom-k, apply the
    (k-1)*M/h_(k) estimator), and of the intersection (KMV Jaccard x
    union estimate). Completes the mergeable-summary family: HLL answers
    one set's cardinality, source_similarity_kmv answers similarity; this
    answers |A∪B| and |A∩B| — the audience-overlap question — from the
    same k-hash summaries. Estimates round to 2 dp; sets smaller than k
    are EXACT (the estimator degenerates to the true count by design).

    Scale shape: distinct (group, hash) inventory (map-side combined) ->
    per-group bottom-k via rank window (group count is LOW cardinality:
    event types, crawl snapshots — the window partitions are the groups)
    -> the pair algebra runs on groups^2 k-length arrays, never corpus
    rows. Hashes are 60-bit md5-derived, so every estimate is
    bit-reproducible in the DuckDB oracle."""
    from pyspark.sql import Window

    max_h = float(1 << 60)
    idx = (
        df.where(F.col(group_col).isNotNull() & F.col(key_col).isNotNull())
        .select(
            F.col(group_col).alias("g"),
            simhash_token_hash(F.col(key_col).cast("string")).alias("h"),
        )
        .distinct()
    )
    w = Window.partitionBy("g").orderBy(F.asc("h"))
    sk = (
        idx.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .groupBy("g")
        .agg(
            F.sort_array(F.collect_list("h")).alias("sk"),
            F.count("*").cast("long").alias("_kn"),
        )
    )

    def est(sk_col, kn_col):
        # fewer than k hashes survive -> the sketch IS the set: exact
        return F.when(kn_col < F.lit(k), kn_col.cast("double")).otherwise(
            F.lit(float(k - 1)) * F.lit(max_h) / F.element_at(sk_col, k)
        )

    a = sk.select(
        F.col("g").alias("grp_a"), F.col("sk").alias("_ska"),
        F.col("_kn").alias("_kna"),
    )
    b = sk.select(
        F.col("g").alias("grp_b"), F.col("sk").alias("_skb"),
        F.col("_kn").alias("_knb"),
    )
    pairs = a.join(F.broadcast(b), F.col("grp_a") < F.col("grp_b"))
    merged = F.array_sort(F.array_distinct(F.concat("_ska", "_skb")))
    pairs = pairs.withColumn("_m", F.slice(merged, 1, k)).withColumn(
        "_mn", F.size("_m").cast("long")
    )
    union_est = F.when(
        F.col("_mn") < F.lit(k), F.col("_mn").cast("double")
    ).otherwise(F.lit(float(k - 1)) * F.lit(max_h) / F.element_at("_m", k))
    shared = F.size(
        F.array_intersect(
            F.array_intersect("_m", "_ska"), F.array_intersect("_m", "_skb")
        )
    )
    jac = shared / F.col("_mn")
    return pairs.select(
        "grp_a",
        "grp_b",
        F.round(est(F.col("_ska"), F.col("_kna")), 2).alias("est_a"),
        F.round(est(F.col("_skb"), F.col("_knb")), 2).alias("est_b"),
        F.round(union_est, 2).alias("est_union"),
        F.round(jac * union_est, 2).alias("est_inter"),
    )
