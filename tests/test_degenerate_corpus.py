"""Whole-surface robustness gate: EVERY queries() entry must evaluate
without raising on a degenerate corpus — null and empty texts, zero and
null embeddings, null event fields. A 10^12-doc crawl WILL contain every
such row; an operator that throws on one poisons its whole job.

Relational (TPC-H) tables reuse sf0.001; documents/embeddings/events are
replaced with adversarial variants that keep the schema."""

import datetime as dt
import os
import shutil

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T


@pytest.fixture(scope="module")
def degen_dir(spark, tmp_path_factory):
    src = "/root/testdata/sf0.001"
    d = str(tmp_path_factory.mktemp("degen"))
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem",
    ]:
        shutil.copy(
            os.path.join(src, f"{t}.parquet"), os.path.join(d, f"{t}.parquet")
        )

    docs = [
        (0, None, None, None, None),
        (1, "", "en", "web", 0),
        (2, "   \n\t  ", None, "web", 7),
        (3, "one", "pt", None, 3),
        (4, "x " * 500, "en", "web", 1000),  # one-token repetition
        (5, "normal little document with several words", "en", "web", 42),
        (6, "\x00\x01\x02 control bytes", "en", "web", 20),
        (7, "ß ſ K unicode case edge", "de", "web", 24),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(os.path.join(d, "documents.parquet"))

    emb_schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    )
    embs = [
        (0, [0.0] * 64, 0),  # zero vector: norm 0
        (1, None, None),  # null vector
        (2, [1.0] + [0.0] * 63, 1),
        (3, [-1.0] * 64, 2),
        (4, [0.5] * 64, 0),
    ]
    spark.createDataFrame(embs, emb_schema).write.parquet(
        os.path.join(d, "embeddings.parquet")
    )

    base = dt.datetime(2024, 1, 1)
    events = [
        (0, None, None, None, None, None),
        (1, base, 1, None, 0.0, None),
        (2, base + dt.timedelta(hours=1), 1, "purchase", None, "{}"),
        (3, base + dt.timedelta(days=1), 2, "error", -5.0, "not json"),
        (4, base + dt.timedelta(days=2), 2, "click", 1.5, '{"k": 1}'),
    ]
    spark.createDataFrame(
        events,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(os.path.join(d, "events.parquet"))
    return d


def test_every_query_survives_degenerate_corpus(spark, degen_dir):
    import __spark_entry__ as entry

    failures = []
    for name, fn in entry.queries().items():
        try:
            n = fn(spark, degen_dir).count()
            assert n >= 0
        except Exception as e:  # noqa: BLE001 — collecting the full list
            failures.append(f"{name}: {type(e).__name__}: {str(e)[:200]}")
    assert failures == [], "\n".join(failures)
