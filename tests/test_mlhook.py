"""ML classification hook (document_classifier.py:117-136,157-173): duck-
typed broadcast model + fusion cascade parity with the oracle."""

import pytest
from pyspark.sql import functions as F

from pdf_extractor_spark.config import load_patterns
from pdf_extractor_spark.operators.mlhook import (
    KeywordStubModel as StubModel,
)
from pdf_extractor_spark.operators.mlhook import classify_documents_with_ml
from pdf_extractor_spark.oracle.classifier import classify_by_rules, fuse_classification


TEXTS = [
    "CONTRATO de prestação de serviços entre as partes",   # ml wins (0.95>0.7)
    "DANFE\nNF-e nº 123456\nCNPJ: 12.345.678/0001-90",     # rules win
    "texto aleatório sem nada",                            # ml 0.55 vs rule 0
    "",                                                    # falsy -> (None, 0)
]


@pytest.fixture(scope="module")
def result(spark):
    df = spark.createDataFrame(
        [(str(i), t) for i, t in enumerate(TEXTS)], "doc_id string, all_text string"
    )
    patterns = load_patterns()
    out = classify_documents_with_ml(df, spark, patterns, StubModel())
    rows = {r.doc_id: (r.doc_type, r.confidence) for r in out.collect()}

    model = StubModel()
    expected = {}
    for i, t in enumerate(TEXTS):
        rt, rs = classify_by_rules(t, patterns)
        if not t.strip():
            mt, ms = None, 0.0
        else:
            mt = model.predict([t])[0]
            ms = max(model.predict_proba([t])[0])
        expected[str(i)] = fuse_classification(rt, rs, mt, ms)
    return rows, expected


def test_fusion_parity_with_oracle(result):
    rows, expected = result
    for k in expected:
        assert rows[k][0] == expected[k][0], k
        assert abs(rows[k][1] - expected[k][1]) < 1e-12, k


def test_ml_dominates_when_confident(result):
    rows, _ = result
    assert rows["0"] == ("contract", 0.95)


def test_no_model_is_rules_only(spark):
    df = spark.createDataFrame([("1", TEXTS[1])], "doc_id string, all_text string")
    out = classify_documents_with_ml(df, spark, load_patterns(), None)
    r = out.collect()[0]
    rt, rs = classify_by_rules(TEXTS[1], load_patterns())
    assert (r.doc_type, r.confidence) == fuse_classification(rt, rs, None, 0.0)
