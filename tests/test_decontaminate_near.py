"""decontaminate_near: hand-computed containment on a seeded leak (an
eval item embedded verbatim in a corpus doc), tie-break determinism, and
the scale pin — the eval shingle side must broadcast, never shuffle the
corpus."""

from pyspark.sql import functions as F

from pdf_extractor_spark.operators.curation import decontaminate_near

EVAL_ROWS = [
    (1000, "alpha beta gamma delta epsilon"),          # 3 shingles
    (1001, "one two three four"),                      # 2 shingles
]


def _frames(spark):
    corpus_rows = [
        (1, "x y z alpha beta gamma delta epsilon"),  # embeds eval 1000
        (2, "totally unrelated text with no overlap at all"),
        (3, "one two three four"),        # identical to eval 1001
        (4, "ab"),                        # too short to shingle
    ]
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    eval_set = spark.createDataFrame(EVAL_ROWS, "doc_id long, text string")
    return corpus, eval_set


def test_containment_hand_computed(spark):
    corpus, eval_set = _frames(spark)
    out = {
        r.doc_id: r
        for r in decontaminate_near(corpus, eval_set, threshold=0.5).collect()
    }

    # doc 1: tokens [x y z alpha beta gamma delta epsilon] -> 6 shingles,
    # 3 of which ("alpha beta gamma", "beta gamma delta", "gamma delta
    # epsilon") are eval-1000 shingles -> containment 3/6 = 0.5
    assert out[1].n_shingles == 6
    assert out[1].best_eval_id == 1000
    assert abs(out[1].containment - 0.5) < 1e-9
    assert out[1].contaminated

    # doc 2: no overlap
    assert out[2].best_eval_id is None
    assert out[2].containment == 0.0 and not out[2].contaminated

    # doc 3: identical to eval 1001 -> containment 1.0
    assert out[3].best_eval_id == 1001
    assert abs(out[3].containment - 1.0) < 1e-9 and out[3].contaminated

    # doc 4: unshingleable -> zero shingles, null best, not contaminated
    assert out[4].n_shingles == 0
    assert out[4].best_eval_id is None and not out[4].contaminated


def test_tie_breaks_to_smallest_eval_id(spark):
    corpus = spark.createDataFrame(
        [(1, "p q r")], "doc_id long, text string"
    )
    # two eval docs each sharing the single shingle -> equal containment
    eval_set = spark.createDataFrame(
        [(20, "p q r"), (10, "p q r")], "doc_id long, text string"
    )
    row = decontaminate_near(corpus, eval_set).collect()[0]
    assert row.best_eval_id == 10


def test_eval_side_broadcasts(spark):
    corpus, eval_set = _frames(spark)
    plan = (
        decontaminate_near(corpus, eval_set)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_threshold_boundary_inclusive(spark):
    corpus, eval_set = _frames(spark)
    out = {
        r.doc_id: r
        for r in decontaminate_near(
            corpus, eval_set, threshold=0.500001
        ).collect()
    }
    assert not out[1].contaminated  # 0.5 < 0.500001
    assert out[3].contaminated
