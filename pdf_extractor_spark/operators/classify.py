"""Classification operators (reference document_classifier.py, SURVEY.md §2.4).

Rule scoring is parity-critical Python-`re` territory (`\\b` around
non-ASCII, IGNORECASE unicode case folding), so it runs as ONE Arrow-batched
pandas UDF per document text, compiled patterns cached per worker
(module-level lru_cache in the oracle). The fusion cascade and the ML hook
are columnar when/otherwise.

The patterns dim is tiny (a handful of doc types) — it travels in the UDF
closure, the broadcast-join analogue of the docs x patterns product
(SURVEY.md §2.8 "the one real join surface").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import DocTypePattern

_RULE_RESULT = T.StructType(
    [
        T.StructField("rule_type", T.StringType(), True),
        T.StructField("rule_score", T.DoubleType(), False),
    ]
)


def classify_by_rules_udf(patterns: dict[str, DocTypePattern]):
    from pyspark.sql.functions import pandas_udf

    # plain tuples in the closure — cheap to pickle, rebuilt per worker
    pattern_items = tuple(
        (dt, p.keywords, p.patterns) for dt, p in patterns.items()
    )

    @pandas_udf(_RULE_RESULT)
    def _classify(texts):
        import pandas as pd

        from ..config import DocTypePattern as DTP
        from ..oracle.classifier import (
            classify_by_rules,
            keyword_presence_batch,
        )

        pats = {dt: DTP(dt, kw, rx) for dt, kw, rx in pattern_items}
        all_kws = tuple(
            sorted({kw for p in pats.values() for kw in p.keywords})
        )
        presence = keyword_presence_batch(texts, all_kws)
        types, scores = [], []
        for text, present in zip(texts, presence):
            t, s = classify_by_rules(text, pats, present=present)
            types.append(t)
            scores.append(s)
        return pd.DataFrame({"rule_type": types, "rule_score": scores})

    return _classify


def fuse_columns(
    rule_type: Column,
    rule_score: Column,
    ml_type: Column | None = None,
    ml_score: Column | None = None,
) -> Column:
    """Fusion cascade (document_classifier.py:157-173) as a when/otherwise
    chain -> struct(doc_type, confidence)."""
    ml_type = ml_type if ml_type is not None else F.lit(None).cast("string")
    ml_score = ml_score if ml_score is not None else F.lit(0.0)

    pick = lambda t, s: F.struct(  # noqa: E731
        t.alias("doc_type"), s.cast("double").alias("confidence")
    )
    none = pick(F.lit(None).cast("string"), F.lit(0.0))
    return (
        F.when(ml_score > 0.7, pick(ml_type, ml_score))
        .when(rule_score > 0.6, pick(rule_type, rule_score))
        .when(
            (ml_score > 0) & (rule_score > 0),
            F.when(ml_score > rule_score, pick(ml_type, ml_score)).otherwise(
                pick(rule_type, rule_score)
            ),
        )
        .when(ml_score > 0, pick(ml_type, ml_score))
        .when(rule_score > 0, pick(rule_type, rule_score))
        .otherwise(none)
    )


def classify_documents(
    df: DataFrame,
    patterns: dict[str, DocTypePattern],
    text_col: str = "all_text",
) -> DataFrame:
    """df + (doc_type, confidence). Empty/null text yields (None, 0.0)
    inside the oracle function (document_classifier.py:86-87,146-148)."""
    rules_udf = classify_by_rules_udf(patterns)
    out = df.withColumn("_rule", rules_udf(F.col(text_col)))
    fused = fuse_columns(F.col("_rule.rule_type"), F.col("_rule.rule_score"))
    return (
        out.withColumn("_fused", fused)
        .withColumn("doc_type", F.col("_fused.doc_type"))
        .withColumn("confidence", F.col("_fused.confidence"))
        .drop("_rule", "_fused")
    )
