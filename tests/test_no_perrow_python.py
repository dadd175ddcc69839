"""input_hint constraint: 'pyspark.sql DataFrame + vectorized pandas/Arrow
UDFs (no per-row Python)'. CI grep (SURVEY.md §4.3): the engine source must
not use row-at-a-time Python UDFs or RDD row maps. The corpus generator's
mapPartitions is the one sanctioned exception (data synthesis, not an
operator)."""

import os
import re

PKG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "pdf_extractor_spark")

FORBIDDEN = [
    (re.compile(r"(?<!pandas_)\budf\("), "row-at-a-time udf("),
    (re.compile(r"\.rdd\b"), ".rdd access"),
    (re.compile(r"\bcollect\(\)\s*\n?.*for\b"), "driver-side loop over collect()"),
]
ALLOW = {
    # deterministic distributed corpus synthesis — input generation,
    # not a pipeline operator (sources/corpus.py docstring)
    ("sources/corpus.py", ".rdd access"),
    # merge planning: the collected list is per-BUCKET counts, bounded by
    # num_buckets (<= 4096), never by table or update rows — the same
    # bounded-metadata class as the IVF centroid collect
    ("merge.py", "driver-side loop over collect()"),
    # HashLRModel.load: the collected rows are the model's weight vector,
    # bounded by the bucket count (256 by default), never by data rows —
    # model loading, the same bounded class as the IVF centroid collect
    ("operators/mlhook.py", "driver-side loop over collect()"),
    # fan_out's df.rdd.getNumPartitions(): partition-count METADATA only —
    # no job runs, no row ever crosses into Python; the .rdd guard exists
    # to block per-row Python row maps, which this is not
    ("session.py", ".rdd access"),
}


def test_no_per_row_python_in_operators():
    hits = []
    for root, _dirs, files in os.walk(PKG):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(root, fn)
            rel = os.path.relpath(path, PKG)
            src = open(path, encoding="utf-8").read()
            for rx, label in FORBIDDEN:
                if rx.search(src) and (rel, label) not in ALLOW:
                    hits.append((rel, label))
    assert hits == [], hits
