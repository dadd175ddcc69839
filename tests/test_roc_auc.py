"""ROC AUC (curation.roc_auc — Mann-Whitney rank-sum with tie
correction, cumulative from the range-partitioned rank engine):
hand-computed toys, a python pair-enumeration parity check, and the
degenerate single-class edge."""


def _scored(spark, rows):
    return spark.createDataFrame(rows, "margin double, label boolean")


def test_auc_perfect_separation(spark):
    from pdf_extractor_spark.operators.curation import roc_auc

    r = roc_auc(
        _scored(
            spark,
            [(3.0, True), (2.0, True), (1.0, False), (0.0, False)],
        ),
        label_col="label",
    ).collect()[0]
    assert (r.n_pos, r.n_neg, r.tie_pairs, r.auc) == (2, 2, 0, 1.0)


def test_auc_reversed_is_zero(spark):
    from pdf_extractor_spark.operators.curation import roc_auc

    r = roc_auc(
        _scored(spark, [(0.0, True), (5.0, False)]), label_col="label"
    ).collect()[0]
    assert r.auc == 0.0


def test_auc_all_tied_is_half(spark):
    from pdf_extractor_spark.operators.curation import roc_auc

    r = roc_auc(
        _scored(
            spark,
            [(1.0, True), (1.0, True), (1.0, False), (1.0, False)],
        ),
        label_col="label",
    ).collect()[0]
    assert (r.tie_pairs, r.auc) == (4, 0.5)


def test_auc_single_class_is_null(spark):
    from pdf_extractor_spark.operators.curation import roc_auc

    r = roc_auc(
        _scored(spark, [(1.0, True), (2.0, True)]), label_col="label"
    ).collect()[0]
    assert r.n_neg == 0 and r.auc is None


def test_auc_matches_pair_enumeration(spark):
    """Deterministic pseudo-random scores with heavy ties vs the O(P*N)
    definitional pair count."""
    from pdf_extractor_spark.operators.curation import roc_auc

    rows = [
        (float((7 * i * i + 3 * i) % 13), (i * 5 + 2) % 3 == 0)
        for i in range(200)
    ]
    pos = [s for s, y in rows if y]
    neg = [s for s, y in rows if not y]
    u = sum(1 for p in pos for n in neg if p > n)
    t = sum(1 for p in pos for n in neg if p == n)
    want = (u + t / 2) / (len(pos) * len(neg))

    r = roc_auc(_scored(spark, rows), label_col="label").collect()[0]
    assert (r.n_pos, r.n_neg, r.tie_pairs) == (len(pos), len(neg), t)
    assert abs(r.auc - want) < 1e-12
