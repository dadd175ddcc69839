"""Hand-computed parity for gt_unseen_mass (Good-Turing unseen-mass
estimate per source) and lsh_candidate_eval (banding precision/recall
scoreboard vs exact-Jaccard ground truth)."""
import pytest
from pyspark.sql import functions as F

from pdf_extractor_spark.operators.dedup import lsh_candidate_eval
from pdf_extractor_spark.operators.textstats import gt_unseen_mass


def test_gt_unseen_mass_hand_computed(spark):
    docs = spark.createDataFrame(
        [
            (1, "web", "a a b c"),
            (2, "web", "a d"),
            (3, "books", "x y"),
            (4, "books", None),
        ],
        "doc_id long, source string, text string",
    )
    rows = {r.source: r for r in gt_unseen_mass(docs).collect()}
    # web: counts a:3 b:1 c:1 d:1 -> N=6 V=4 N1=3 N2=0 p0=0.5
    w = rows["web"]
    assert (w.n_tokens, w.vocab, w.n1, w.n2) == (6, 4, 3, 0)
    assert w.p_unseen == 0.5
    # books: x:1 y:1 -> N=2 V=2 N1=2 p0=1.0; the null-text doc adds nothing
    b = rows["books"]
    assert (b.n_tokens, b.vocab, b.n1, b.n2) == (2, 2, 2, 0)
    assert b.p_unseen == 1.0


def test_gt_unseen_mass_ordered_by_source(spark):
    docs = spark.createDataFrame(
        [(1, "zz", "a"), (2, "aa", "b")],
        "doc_id long, source string, text string",
    )
    assert [r.source for r in gt_unseen_mass(docs).collect()] == ["aa", "zz"]


def test_lsh_candidate_eval_exact_dup_pair(spark):
    # two identical docs (Jaccard 1.0 -> certain candidate + truth) and
    # one unrelated doc
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "completely different words in this document here now"),
        ],
        "doc_id long, text string",
    )
    row = lsh_candidate_eval(docs).first()
    assert row.n_candidates == 1
    assert row.n_truth == 1
    assert row.true_pairs == 1
    assert row.precision == 1.0
    assert row.recall == 1.0


def test_lsh_candidate_eval_no_pairs(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "one two three four five six seven"),
        ],
        "doc_id long, text string",
    )
    row = lsh_candidate_eval(docs).first()
    assert row.n_candidates == 0
    assert row.n_truth == 0
    assert row.true_pairs == 0
    assert row.precision is None
    assert row.recall is None


def test_lsh_candidate_eval_short_docs_emit_nothing(spark):
    # < n tokens -> no shingles -> no signatures -> empty scoreboard
    docs = spark.createDataFrame(
        [(1, "one two"), (2, "one two")], "doc_id long, text string"
    )
    row = lsh_candidate_eval(docs).first()
    assert row.n_candidates == 0 and row.n_truth == 0
