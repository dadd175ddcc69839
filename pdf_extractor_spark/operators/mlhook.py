"""ML classification hook (reference document_classifier.py:117-136,
SURVEY.md §2.4 'ML classification').

The reference loads a pickled sklearn (TF-IDF vectorizer + RandomForest)
pair if present and returns (None, 0.0) when absent — the model file does
not ship in the repo, so this is an OPTIONAL hook there and here.

Spark-first shape: the pickled model rides a broadcast variable (one
deserialization per executor, not per task), scoring happens in an
Arrow-batched pandas UDF, and the fusion cascade stays columnar
(operators/classify.fuse_columns already accepts the ml columns).

Model contract (duck-typed so sklearn pipelines drop in unchanged when the
runtime has sklearn): `predict(list[str]) -> labels` and either
`predict_proba(list[str]) -> row-wise probabilities` or nothing (score 1.0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_ML_RESULT = T.StructType(
    [
        T.StructField("ml_type", T.StringType(), True),
        T.StructField("ml_score", T.DoubleType(), False),
    ]
)


class KeywordStubModel:
    """Deterministic stand-in for the sklearn pipeline (the runtime here,
    like the reference repo, ships no model file / no sklearn): labels by
    keyword membership with fixed probabilities. Used by tests and as the
    default demo model; any object with the same duck-type (e.g. a real
    sklearn Pipeline) drops in unchanged."""

    def __init__(self, keyword: str = "contrato", label: str = "contract",
                 other: str = "other", p_hit: float = 0.95, p_miss: float = 0.55):
        self.keyword = keyword
        self.label = label
        self.other = other
        self.p_hit = p_hit
        self.p_miss = p_miss

    def predict(self, texts):
        return [
            self.label if self.keyword in (t or "").lower() else self.other
            for t in texts
        ]

    def predict_proba(self, texts):
        return [
            [self.p_hit, 1 - self.p_hit]
            if self.keyword in (t or "").lower()
            else [self.p_miss, 1 - self.p_miss]
            for t in texts
        ]


class HashLRModel:
    """TRAINED hashed-BoW model for the ML hook (the jobs/run_train.py
    artifact, loaded): same duck-type as the sklearn pipeline the
    reference would unpickle. Margin = sum of per-DISTINCT-token bucket
    weights (the Python twin of hash_lr_score(binary=True)'s fold),
    compared against the trained LDA-midpoint threshold; probability is
    a logistic squash of the threshold-centered margin so the fusion
    cascade's >0.7 gate is reachable for confident docs."""

    def __init__(self, weights, label: str, other: str = "other",
                 threshold: float = 0.0, temperature: float | None = None):
        self.weights = [float(w) for w in weights]
        self.buckets = len(self.weights)
        self.label = label
        self.other = other
        self.threshold = float(threshold)
        # default temperature scales the logistic to the weight
        # magnitude (integer weights scale with corpus size)
        if temperature is None:
            span = max(abs(w) for w in self.weights) or 1.0
            temperature = 5.0 / span
        self.temperature = temperature

    def _margin(self, text: str) -> float:
        import hashlib

        m = 0.0
        for tok in set((text or "").lower().split()):
            j = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % self.buckets
            m += self.weights[j]
        return m

    def predict(self, texts):
        return [
            self.label if self._margin(t) > self.threshold else self.other
            for t in texts
        ]

    def predict_proba(self, texts):
        import math

        out = []
        for t in texts:
            z = self.temperature * (self._margin(t) - self.threshold)
            p = 1.0 / (1.0 + math.exp(-max(min(z, 60.0), -60.0)))
            out.append([p, 1.0 - p] if p >= 0.5 else [1.0 - p, p])
        return out

    @classmethod
    def load(cls, spark: SparkSession, path: str, label: str,
             threshold: float = 0.0, **kw):
        """Read the (bucket, weight) parquet artifact run_train.py wrote
        (threshold from its manifest.json)."""
        rows = spark.read.parquet(path).select("bucket", "weight").collect()
        weights = [0.0] * (max(r["bucket"] for r in rows) + 1)
        for r in rows:
            weights[r["bucket"]] = r["weight"]
        return cls(weights, label, threshold=threshold, **kw)


def classify_by_ml_udf(spark: SparkSession, model):
    """Returns a pandas UDF text -> struct(ml_type, ml_score). `model` is
    broadcast once; None model (reference: no model file) scores every row
    (None, 0.0)."""
    from pyspark.sql.functions import pandas_udf

    bc = spark.sparkContext.broadcast(model)

    @pandas_udf(_ML_RESULT)
    def _ml(texts):
        import pandas as pd

        m = bc.value
        if m is None:
            return pd.DataFrame(
                {"ml_type": [None] * len(texts), "ml_score": [0.0] * len(texts)}
            )
        vals = ["" if t is None else t for t in texts]
        labels = list(m.predict(vals))
        if hasattr(m, "predict_proba"):
            import numpy as np

            proba = np.asarray(m.predict_proba(vals))
            scores = proba.max(axis=1).astype(float).tolist()
        else:
            scores = [1.0] * len(labels)
        # reference returns (None, 0.0) for empty text (classify_document
        # guards on falsy text, document_classifier.py:146-148)
        out_t, out_s = [], []
        for t, lbl, s in zip(texts, labels, scores):
            if t is None or not str(t).strip():
                out_t.append(None)
                out_s.append(0.0)
            else:
                out_t.append(str(lbl))
                out_s.append(float(s))
        return pd.DataFrame({"ml_type": out_t, "ml_score": out_s})

    return _ml


def classify_documents_with_ml(
    df: DataFrame,
    spark: SparkSession,
    patterns,
    model,
    text_col: str = "all_text",
) -> DataFrame:
    """Rules + ML + fusion cascade (document_classifier.py:138-173): rule
    scoring in its pandas UDF, ML scoring in this hook's UDF, cascade as
    columnar when/otherwise."""
    from .classify import classify_by_rules_udf, fuse_columns

    rules = classify_by_rules_udf(patterns)
    ml = classify_by_ml_udf(spark, model)
    out = df.withColumn("_rule", rules(F.col(text_col))).withColumn(
        "_ml", ml(F.col(text_col))
    )
    fused = fuse_columns(
        F.col("_rule.rule_type"),
        F.col("_rule.rule_score"),
        F.col("_ml.ml_type"),
        F.col("_ml.ml_score"),
    )
    return (
        out.withColumn("_f", fused)
        .withColumn("doc_type", F.col("_f.doc_type"))
        .withColumn("confidence", F.col("_f.confidence"))
        .drop("_rule", "_ml", "_f")
    )
