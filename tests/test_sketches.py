"""Count-Min Sketch invariants: overestimate-only, exactness without
collisions, and cell-wise mergeability (the property that makes it a
per-shard summary at scale)."""

from pyspark.sql import functions as F

from pdf_extractor_spark.operators.sketches import cms_estimates, cms_table


def test_cms_never_underestimates(spark):
    df = spark.range(2000).select(
        (F.col("id") % 37).cast("string").alias("k")
    )
    est = cms_estimates(df, "k", depth=4, width=16).collect()
    assert len(est) == 37
    assert all(r.cms_est >= r.exact_n for r in est)
    # width 16 << 37 keys: collisions must exist somewhere
    assert any(r.cms_est > r.exact_n for r in est)


def test_cms_exact_when_wide(spark):
    df = spark.range(300).select((F.col("id") % 5).cast("string").alias("k"))
    est = cms_estimates(df, "k", depth=4, width=1024).collect()
    assert all(r.cms_est == r.exact_n for r in est)


def test_cms_merges_cellwise(spark):
    a = spark.range(0, 500).select((F.col("id") % 11).cast("string").alias("k"))
    b = spark.range(500, 900).select(
        (F.col("id") % 13).cast("string").alias("k")
    )
    merged = (
        cms_table(a, "k", depth=4, width=32)
        .unionByName(cms_table(b, "k", depth=4, width=32))
        .groupBy("d", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = cms_table(a.unionByName(b), "k", depth=4, width=32)
    diff = merged.join(
        whole.withColumnRenamed("cnt", "cnt2"), ["d", "bucket"], "full"
    ).filter(
        F.coalesce("cnt", F.lit(-1)) != F.coalesce("cnt2", F.lit(-1))
    )
    assert diff.count() == 0


def test_bloom_no_false_negatives_and_low_fp(spark):
    from pdf_extractor_spark.operators.sketches import (
        bloom_build,
        bloom_member,
    )

    members = spark.range(200).select(
        F.concat(F.lit("k"), F.col("id")).alias("key")
    )
    bloom = bloom_build(members, "key", bits=4096, hashes=5)
    assert bloom.count() <= 4096 // 63 + 1  # fixed-size summary

    probe = spark.range(1000).select(
        F.col("id"),
        F.when(F.col("id") < 200, F.concat(F.lit("k"), F.col("id")))
        .otherwise(F.concat(F.lit("x"), F.col("id")))
        .alias("key"),
    )
    res = {
        r.id: r.bloom_hit
        for r in bloom_member(probe, "key", bloom, "id").collect()
    }
    # every true member hits (no false negatives, the bloom guarantee)
    assert all(res[i] for i in range(200))
    # false positives bounded: 200*5/4096 bits set -> fp ~ (0.22)^5 ~ 0.05%
    fps = sum(1 for i in range(200, 1000) if res[i])
    assert fps <= 8, fps


def _ev(spark, n=600):
    return spark.range(n).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 4).cast("string").alias("event_type"),
        (F.col("id") * 7 % 101).cast("double").alias("value"),
    )


def test_sample_sketch_merges_exactly(spark):
    from pdf_extractor_spark.operators.sketches import (
        merge_sample_sketches,
        sample_sketch,
    )

    ev = _ev(spark)
    whole = sample_sketch(ev, "event_type", "value", "event_id", k=16)
    shards = [
        sample_sketch(
            ev.where(F.col("event_id") % 3 == i),
            "event_type",
            "value",
            "event_id",
            k=16,
        )
        for i in range(3)
    ]
    joined = (
        shards[0]
        .select("g", F.col("sk").alias("s0"))
        .join(shards[1].select("g", F.col("sk").alias("s1")), "g", "full")
        .join(shards[2].select("g", F.col("sk").alias("s2")), "g", "full")
    )
    merged = joined.select(
        "g",
        merge_sample_sketches(
            merge_sample_sketches(F.col("s0"), F.col("s1"), 16),
            F.col("s2"),
            16,
        ).alias("sk"),
    )
    cmp = merged.join(whole.select("g", F.col("sk").alias("sk_g")), "g")
    # semilattice law: merge of shard bottom-ks == bottom-k of the union
    assert cmp.where(F.col("sk") != F.col("sk_g")).count() == 0
    assert cmp.count() == 4


def test_sample_sketch_small_group_is_exhaustive(spark):
    from pdf_extractor_spark.operators.sketches import (
        sample_sketch,
        sketch_quantile,
    )

    # group smaller than k: the sketch IS the group, quantiles are exact
    # order stats of the full value set
    ev = _ev(spark, n=40).where(F.col("event_type") == "1")
    row = (
        sample_sketch(ev, "event_type", "value", "event_id", k=64)
        .select(
            "n",
            F.size("sk").alias("m"),
            sketch_quantile(F.col("sk"), 0.0).alias("lo"),
            sketch_quantile(F.col("sk"), 1.0).alias("hi"),
        )
        .collect()[0]
    )
    vals = sorted(r.value for r in ev.collect())
    assert row.n == row.m == len(vals)
    assert row.lo == vals[0] and row.hi == vals[-1]


def test_sample_sketch_prefilter_matches_unfiltered(spark):
    from pdf_extractor_spark.operators.sketches import sample_sketch

    ev = _ev(spark, n=2000)
    # factor 8 cut vs effectively-unfiltered: identical sketches (the
    # md5-uniformity argument the scale prefilter rests on)
    cut = sample_sketch(ev, "event_type", "value", "event_id", k=8,
                        prefilter_factor=8)
    full = sample_sketch(ev, "event_type", "value", "event_id", k=8,
                         prefilter_factor=10**9)
    cmp = cut.select("g", "sk").join(
        full.select("g", F.col("sk").alias("sk_f")), "g"
    )
    assert cmp.where(F.col("sk") != F.col("sk_f")).count() == 0


def test_heavy_hitters_equals_plain_groupby(spark):
    from pdf_extractor_spark.operators.sketches import heavy_hitters

    rows = [(i % 7,) for i in range(400)] + [(99,)] * 3
    df = spark.createDataFrame(rows, "user_id long")
    got = {
        r.key: r.exact_n for r in heavy_hitters(df, "user_id", 50).collect()
    }
    # keys 0..6 have 57-58 rows; key 99 has 3 -> prefilter must not lose
    # any >=50 key and the final exact filter must drop 99
    want = {}
    for (k,) in rows:
        want[k] = want.get(k, 0) + 1
    want = {k: v for k, v in want.items() if v >= 50}
    assert got == want and 99 not in got


def test_heavy_hitters_narrow_width_collisions_still_exact(spark):
    from pdf_extractor_spark.operators.sketches import heavy_hitters

    # width=4 forces massive sketch collisions: estimates inflate, more
    # candidates survive the prefilter, but the output is still exact
    rows = [(i % 23,) for i in range(230)]
    df = spark.createDataFrame(rows, "user_id long")
    got = {
        r.key: r.exact_n
        for r in heavy_hitters(df, "user_id", 10, depth=2, width=4).collect()
    }
    assert got == {k: 10 for k in range(23)}
