"""dedup_threshold_curve wrapper semantics via the underlying pairs."""

from pyspark.sql import functions as F

from pdf_extractor_spark.operators.dedup import ngram_jaccard_pairs


def test_threshold_curve_counts_monotone(spark):
    base = "a b c d e f g h i j"
    rows = [
        (1, base),
        (2, base),                 # jaccard 1.0 with 1
        (3, base + " k l m"),      # high-but-below-1 overlap with 1/2
        (4, "totally different words in this doc entirely"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = ngram_jaccard_pairs(df, n=3, threshold=0.0)
    jacs = {(r.id1, r.id2): r.jaccard for r in pairs.collect()}
    assert jacs[(1, 2)] == 1.0
    assert 0.0 < jacs[(1, 3)] < 1.0
    th = spark.createDataFrame(
        [(0.5,), (1.0,)], "threshold double"
    )
    curve = {
        r.threshold: r.n_pairs
        for r in th.join(pairs, F.lit(True), "left")
        .groupBy("threshold")
        .agg(
            F.sum(
                F.when(F.col("jaccard") >= F.col("threshold"), 1).otherwise(0)
            ).cast("long").alias("n_pairs")
        )
        .collect()
    }
    # counts are monotone non-increasing in the threshold
    assert curve[0.5] >= curve[1.0]
    assert curve[1.0] == 1  # only the exact-dup pair
