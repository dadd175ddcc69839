"""extract_pipeline_digest: Spark pipeline digest vs an independent
pure-Python recomputation (oracle functions + hashlib), per-doc.

Third leg of the parity triangle for the driver-hashable pipeline query:
the DuckDB SQL twin is checked by tools/check_correctness.py; this test
recomputes the layout -> detect -> preprocess -> span/order rebuild ->
digest -> classify chain in plain Python (reference extractor.py:38-95 +
document_classifier.py:84-173 semantics) with no SQL and no Spark
expressions involved."""

import hashlib
import os

import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _expected_row(doc_id, text):
    from pdf_extractor_spark.oracle.classifier import (
        classify_by_rules,
        fuse_classification,
    )
    from pdf_extractor_spark.oracle.language import (
        detect_language,
        preprocess_for_language,
    )
    from pdf_extractor_spark.config import DocTypePattern

    import __spark_entry__ as entry

    t = text or ""
    n = len(t)
    wins = [t[i * 40 : (i + 1) * 40] if n > i * 40 else None for i in range(5)]
    sample = "\n".join(w for w in wins[:3] if w is not None)
    lang = detect_language(sample)
    pp = [
        preprocess_for_language(w, lang) if w is not None else None
        for w in wins
    ]
    # offset order: t0, m0, t1, t2, m1, t3, t4 (presence per layout)
    spans = []
    if n > 0:
        spans.append(("text", pp[0], ""))
        spans.append(("image", "", "m0"))
    if n > 40:
        spans.append(("text", pp[1], ""))
    if n > 80:
        spans.append(("text", pp[2], ""))
        spans.append(("image", "", "m1"))
    if n > 120:
        spans.append(("text", pp[3], ""))
    if n > 160:
        spans.append(("text", pp[4], ""))
    seq = "\x01".join(
        f"{kind}|{txt}|{media}|{i}" for i, (kind, txt, media) in enumerate(spans)
    )
    digest = hashlib.md5(seq.encode("utf-8")).hexdigest()
    all_text = "\n".join(s[1] for s in spans if s[0] == "text")
    pats = {
        dt: DocTypePattern(dt, tuple(kws), tuple(ps))
        for dt, kws, ps in entry.DOC_RULES
    }
    rule_type, rule_score = classify_by_rules(all_text, pats)
    doc_type, confidence = fuse_classification(rule_type, rule_score, None, 0.0)
    num_pages = sum(1 for s in spans if s[0] == "text")
    return (
        str(doc_id),
        digest,
        doc_type,
        round(confidence, 6),
        lang,
        num_pages,
    )


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="driver testdata absent")
def test_digest_matches_python_recompute(spark):
    import __spark_entry__ as entry

    docs = pq.read_table(
        os.path.join(SF_DIR, "documents.parquet"), columns=["doc_id", "text"]
    ).to_pylist()
    expected = {
        str(d["doc_id"]): _expected_row(d["doc_id"], d["text"]) for d in docs
    }

    got = entry.queries()["extract_pipeline_digest"](spark, SF_DIR).collect()
    assert len(got) == len(expected)
    n_typed = 0
    for r in got:
        exp = expected[r["doc_id"]]
        act = (
            r["doc_id"],
            r["span_digest"],
            r["doc_type"],
            round(r["confidence"], 6),
            r["lang"],
            r["num_pages"],
        )
        assert act == exp, f"doc {r['doc_id']}: {act} != {exp}"
        if r["doc_type"] is not None:
            n_typed += 1
    # the rule vocabulary overlaps the corpus: classification must be
    # non-vacuous (some docs classified, digest covers real variety)
    assert n_typed > 0
    assert len({r["span_digest"] for r in got}) > len(got) // 2
