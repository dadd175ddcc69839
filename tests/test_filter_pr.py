"""filter_pr — hand-computed precision/recall vs committee verdict."""

from pdf_extractor_spark.operators.curation import filter_pr


def _flags(spark, flags):
    return spark.createDataFrame(
        [(i, bool(f)) for i, f in enumerate(flags)],
        "doc_id long, accept boolean",
    )


def test_filter_pr(spark):
    # docs 0-3: g = 1,1,0,0; c = 1,0,1,0; l = 1,1,1,0
    # verdicts (majority): 1,1,1,0
    g = _flags(spark, [1, 1, 0, 0])
    c = _flags(spark, [1, 0, 1, 0])
    h = _flags(spark, [1, 1, 1, 0])
    got = {r.filter: r for r in filter_pr(g, c, h).collect()}

    rg = got["gopher"]
    # g accepts docs 0,1 (both verdict-true): tp=2 fp=0 fn=1 tn=1
    assert (rg.tp, rg.fp, rg.fn, rg.tn) == (2, 0, 1, 1)
    assert rg.precision == 1.0
    assert abs(rg.recall - round(2 / 3, 6)) < 1e-9
    f1 = 2 * 1.0 * (2 / 3) / (1.0 + 2 / 3)
    assert abs(rg.f1 - round(f1, 6)) < 1e-6

    rl = got["hash_lr"]
    # l accepts 0,1,2 (all verdict-true): perfect agreement with verdict
    assert (rl.tp, rl.fp, rl.fn, rl.tn) == (3, 0, 0, 1)
    assert rl.precision == 1.0 and rl.recall == 1.0 and rl.f1 == 1.0


def test_filter_pr_degenerate(spark):
    # a filter that accepts nothing: precision null, recall 0
    g = _flags(spark, [0, 0])
    c = _flags(spark, [1, 1])
    h = _flags(spark, [1, 1])
    got = {r.filter: r for r in filter_pr(g, c, h).collect()}
    rg = got["gopher"]
    assert rg.precision is None and rg.recall == 0.0 and rg.f1 is None
