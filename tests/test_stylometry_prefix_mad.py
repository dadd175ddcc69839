"""stylometry_delta, source_diversity, autocomplete_prefix, anomaly_mad."""


def test_stylometry_delta_identical_sources_closest(spark):
    from pdf_extractor_spark.operators.stylometry import stylometry_delta

    # s1 and s2 share the same marker profile; s3 differs
    df = spark.createDataFrame(
        [
            (1, "x x y", "s1"),
            (2, "x x y", "s2"),
            (3, "y y y x", "s3"),
        ],
        "doc_id long, text string, source string",
    )
    rows = stylometry_delta(df, n_markers=2, top_k=3).collect()
    assert rows[0].rank == 1
    assert (rows[0].src_a, rows[0].src_b) == ("s1", "s2")
    assert rows[0].delta == 0.0
    assert len(rows) == 3


def test_source_diversity_hand_computed(spark):
    from pdf_extractor_spark.operators.stylometry import source_diversity

    df = spark.createDataFrame(
        [
            (1, "a a a a", "mono"),        # all same -> simpson 0
            (2, "a b c d", "poly"),        # all distinct -> simpson 1
        ],
        "doc_id long, text string, source string",
    )
    got = {r.source: r for r in source_diversity(df).collect()}
    assert (got["mono"].n_tokens, got["mono"].n_distinct) == (4, 1)
    assert got["mono"].simpson == 0.0
    assert got["poly"].simpson == 1.0


def test_autocomplete_prefix_hand_computed(spark):
    from pdf_extractor_spark.operators.keywords import autocomplete_prefix

    df = spark.createDataFrame(
        [(1, "table table tablet tab ta cup")],
        "doc_id long, text string",
    )
    got = {r.prefix: r for r in autocomplete_prefix(df).collect()}
    # 'ta' (2 chars) skipped; 'tab' prefix covers table x2, tablet, tab
    assert got["tab"].n_tokens == 4
    assert (got["tab"].top_token, got["tab"].top_count) == ("table", 2)
    assert got["cup"].n_tokens == 1


def test_anomaly_mad_hand_computed(spark):
    from pdf_extractor_spark.operators.events import anomaly_mad

    # values: 10,10,10,10,100 -> med 10, _ad = 0,0,0,0,90 -> mad 0;
    # outlier iff _ad > 5*0 -> the 100 row only
    rows = [(i, "view", 10.0) for i in range(4)] + [(9, "view", 100.0)]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    r = anomaly_mad(df).collect()[0]
    assert (r.n, r.med, r.mad, r.n_outliers) == (5, 10.0, 0.0, 1)


def test_anomaly_mad_no_outliers(spark):
    from pdf_extractor_spark.operators.events import anomaly_mad

    rows = [(i, "click", float(10 + i)) for i in range(5)]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    r = anomaly_mad(df).collect()[0]
    # values 10..14: med 12, _ad = 2,1,0,1,2 -> mad 1; 5*1=5 > all _ad
    assert (r.med, r.mad, r.n_outliers) == (12.0, 1.0, 0)
