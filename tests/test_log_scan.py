"""Analytics log scan (analytics.py:19-46): batch `details` flattening into
one record stream — mirrors the reference's own test fixture shape
(tests/test_analytics.py:29-91: 3 single logs + 1 batch of 2 -> 5 records)."""

import json
import os

from pdf_extractor_spark.operators.analytics import load_analytics_logs


def test_details_flattening(spark, tmp_path):
    logs = [
        {"pdf_path": "a.pdf", "doc_type": "invoice", "success": True,
         "confidence": 0.9, "timestamp": "2023-05-01T10:00:00",
         "processing_time": 1.5},
        {"pdf_path": "b.pdf", "doc_type": "receipt", "success": True,
         "confidence": 0.7, "timestamp": "2023-05-02T11:00:00",
         "processing_time": 0.8},
        {"pdf_path": "c.pdf", "doc_type": None, "success": False,
         "timestamp": "2023-05-03T12:00:00", "processing_time": 2.1,
         "error": "Failed to extract data"},
        {  # batch log: records nested under details (analytics.py:33-40)
            "timestamp": "2023-05-04T09:00:00",
            "stats": {"total": 2, "successful": 2},
            "details": [
                {"pdf_path": "d.pdf", "doc_type": "invoice", "success": True,
                 "confidence": 0.8, "timestamp": "2023-05-04T09:00:01",
                 "processing_time": 1.1},
                {"pdf_path": "e.pdf", "doc_type": "contract", "success": True,
                 "confidence": 0.6, "timestamp": "2023-05-04T09:00:02",
                 "processing_time": 1.3},
            ],
        },
    ]
    d = tmp_path / "logs"
    d.mkdir()
    for i, rec in enumerate(logs):
        (d / f"log_{i}.json").write_text(json.dumps(rec))

    out = load_analytics_logs(spark, str(d))
    rows = {r.pdf_path: r for r in out.collect()}
    assert len(rows) == 5  # 3 singles + 2 flattened batch records
    assert rows["d.pdf"].doc_type == "invoice"
    assert rows["c.pdf"].success is False and rows["c.pdf"].error
    types = sorted(r.doc_type for r in rows.values() if r.doc_type)
    assert types == ["contract", "invoice", "invoice", "receipt"]


def test_props_variant_stats_handles_junk(spark):
    import datetime as dt

    from pdf_extractor_spark.operators.analytics import props_variant_stats

    base = dt.datetime(2024, 1, 1)
    rows = [
        (0, base, 1, "click", 1.0, '{"k": 10}'),
        (1, base, 1, "click", 1.0, '{"k": 20}'),
        (2, base, 2, "click", 1.0, "not json"),   # malformed -> NULL
        (3, base, 2, "click", 1.0, None),         # missing -> NULL
        (4, base, 2, "view", 1.0, "{}"),          # no $.k -> NULL
        (5, base, 3, "view", 1.0, '{"k": 7}'),
        (6, base, 3, "view", 1.0, '{"k": "abc"}'),  # wrong-typed -> NULL
        (7, base, 3, "view", 1.0, '{"k": [1]}'),    # wrong-typed -> NULL
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = {
        r.event_type: (r.n, r.min_k, r.max_k, r.avg_k)
        for r in props_variant_stats(df).collect()
    }
    assert got == {"click": (2, 10, 20, 15.0), "view": (1, 7, 7, 7.0)}
