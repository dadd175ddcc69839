"""SQ8 scalar quantization: the per-dimension reconstruction bound, and
the property that justifies 4x-smaller vectors — cosine top-k over
dequantized vectors preserves the exact ranking almost everywhere."""

from pyspark.sql import functions as F

from pdf_extractor_spark.operators.similarity import sq8_quantize


def _emb(spark):
    return spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")


def test_sq8_reconstruction_bound(spark):
    emb = _emb(spark)
    q = sq8_quantize(emb)
    # per-dimension bound: err <= range/(2*levels); check against the
    # widest dimension's range (a safe over-bound for every dimension)
    stats = emb.select(F.posexplode("embedding").alias("pos", "x")).groupBy(
        "pos"
    ).agg((F.max("x") - F.min("x")).alias("rng"))
    worst = stats.agg(F.max("rng")).collect()[0][0]
    bound = worst / (2 * 127) + 1e-4  # + the max_err rounding grain
    bad = q.filter(F.col("max_err") > bound).count()
    assert bad == 0, f"{bad} vectors exceed the SQ8 bound {bound}"
    assert q.count() == emb.count()
    assert all(
        0 <= v <= 127 for v in q.select("qvec").first().qvec
    )


def test_sq8_preserves_topk_recall(spark):
    emb = _emb(spark).limit(300)
    q = sq8_quantize(emb)
    stats = emb.select(F.posexplode("embedding").alias("pos", "x")).groupBy(
        "pos"
    ).agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    # dequantize distributed: join stats, rebuild
    deq = (
        q.select("id", F.posexplode("qvec").alias("pos", "qv"))
        .join(F.broadcast(stats), "pos")
        .withColumn(
            "xr",
            F.col("mn")
            + F.col("qv")
            * F.when(F.col("mx") > F.col("mn"), F.col("mx") - F.col("mn"))
            .otherwise(F.lit(1.0))
            / 127.0,
        )
        .groupBy("id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "xr"))),
                lambda s: s["xr"],
            ).alias("vec")
        )
    )

    def topk(vdf, vcol, n=10, qid=0):
        qv = vdf.filter(F.col("id") == qid).select(vcol).first()[0]
        dot = F.aggregate(
            F.zip_with(vcol, F.array(*[F.lit(float(x)) for x in qv]), lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        nrm = F.sqrt(F.aggregate(vcol, F.lit(0.0), lambda acc, x: acc + x * x))
        qn = sum(float(x) * float(x) for x in qv) ** 0.5
        return [
            r.id
            for r in vdf.filter(F.col("id") != qid)
            .select("id", (dot / (nrm * qn)).alias("c"))
            .orderBy(F.desc("c"), "id")
            .limit(n)
            .collect()
        ]

    exact_df = emb.select(
        F.col("vec_id").alias("id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("vec"),
    )
    exact = topk(exact_df, "vec")
    approx = topk(deq, "vec")
    recall = len(set(exact) & set(approx)) / len(exact)
    assert recall >= 0.9, (recall, exact, approx)


def test_embedding_outliers_flags_and_guards(spark):
    from pdf_extractor_spark.operators.similarity import embedding_outliers

    rows = [(i, [1.0, 0.0, 0.0], 0) for i in range(8)]
    rows.append((100, [30.0, 0.0, 0.0], 0))   # wild norm -> outlier
    rows.append((101, None, 0))               # null vector: dropped
    rows.append((102, [1.0, 0.0], 0))         # wrong dim: dropped
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    got = {r.vec_id: r for r in embedding_outliers(df, dim=3).collect()}
    assert set(got) == set(range(8)) | {100}
    assert got[100].is_outlier and got[100].z > 2
    assert all(not got[i].is_outlier for i in range(8))
    # centroid is dominated by the first axis: inliers align with it
    assert got[0].cos_centroid == 1.0


def test_embedding_outliers_constant_norms_never_flag(spark):
    from pdf_extractor_spark.operators.similarity import embedding_outliers

    df = spark.createDataFrame(
        [(i, [0.0, 2.0], 0) for i in range(5)],
        "vec_id long, embedding array<float>, label int",
    )
    out = embedding_outliers(df, dim=2).collect()
    # sd == 0: z is NULL, the flag must be False (not NULL) on every row
    assert all(r.z is None and r.is_outlier is False for r in out)


def test_cluster_balanced_sample_quota_law(spark):
    import numpy as np

    from pdf_extractor_spark.operators.similarity import (
        cluster_balanced_sample,
    )

    # two well-separated clusters on the axes, sizes 6 and 3
    rows = [(i, [1.0, 0.0], 0) for i in range(6)]
    rows += [(10 + i, [0.0, 1.0], 0) for i in range(3)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    cents = np.array([[1.0, 0.0], [0.0, 1.0]])
    out = cluster_balanced_sample(df, cents, quota=2).collect()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r.cluster, []).append(r)
    assert {r.vec_id for r in by_cluster[0]} == set(range(6))
    assert {r.vec_id for r in by_cluster[1]} == {10, 11, 12}
    for c, rows_ in by_cluster.items():
        ranks = sorted(r.pick_rank for r in rows_)
        assert ranks == list(range(1, len(rows_) + 1))
        assert sum(r.kept for r in rows_) == min(2, len(rows_))
    # determinism: same picks on rerun
    again = {(r.vec_id, r.kept) for r in cluster_balanced_sample(df, cents, quota=2).collect()}
    assert again == {(r.vec_id, r.kept) for r in out}
