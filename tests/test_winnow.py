"""winnow_fingerprints: the winnowing guarantee (docs sharing a >= w+k-1
token run share a fingerprint), short-doc degradation, independence from a
pure-Python reimplementation, and the plan pin that the md5 gram pipeline
is evaluated exactly once (the explode size-filter pushdown trap)."""

import hashlib

from pdf_extractor_spark.operators.dedup import winnow_fingerprints

K, W = 3, 4


def _py_winnow(text: str, k: int = K, w: int = W) -> set[int]:
    """Independent reimplementation with stdlib md5 (no Spark types)."""
    toks = text.lower().split()
    if len(toks) < k:
        return set()
    grams = [
        int(hashlib.md5(" ".join(toks[i : i + k]).encode()).hexdigest()[:15], 16)
        for i in range(len(toks) - k + 1)
    ]
    if len(grams) < w:
        return {min(grams)}
    return {min(grams[j : j + w]) for j in range(len(grams) - w + 1)}


DOCS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    # shares the >= w+k-1 = 6-token run "quick brown fox jumps over the"
    (2, "a very quick brown fox jumps over the sleeping cat today"),
    (3, "completely different words about solar panels and wind turbines"),
    (4, "tiny doc"),          # < k tokens -> no fingerprints
    (5, "just three tokens"), # exactly k -> 1 gram -> 1 fingerprint
]


def test_matches_python_model(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {}
    for r in winnow_fingerprints(df, k=K, w=W).collect():
        got.setdefault(r.doc_id, set()).add(r.fingerprint)
    for doc_id, text in DOCS:
        assert got.get(doc_id, set()) == _py_winnow(text), doc_id


def test_shared_run_guarantee(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    fps = {}
    for r in winnow_fingerprints(df, k=K, w=W).collect():
        fps.setdefault(r.doc_id, set()).add(r.fingerprint)
    assert fps[1] & fps[2], "docs sharing a w+k-1 token run must collide"
    assert not (fps[1] & fps[3])
    assert 4 not in fps
    assert len(fps[5]) == 1


def test_gram_pipeline_evaluated_once(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = (
        winnow_fingerprints(df, k=K, w=W)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert plan.count("md5(") == 1
    assert "Exchange" not in plan


def test_winnow_pairs_detects_shared_run(spark):
    from pdf_extractor_spark.operators.dedup import winnow_pairs

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    pairs = {
        (r.id1, r.id2): r.n_shared
        for r in winnow_pairs(df, k=K, w=W, min_shared=1).collect()
    }
    assert (1, 2) in pairs  # the shared 6-token run
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_winnow_pairs_hot_cap_bounds_degenerate_corpus(spark):
    from pdf_extractor_spark.operators.dedup import winnow_pairs

    # 50 identical docs: every fingerprint has df=50 > max_df=10 -> all
    # dropped, zero candidate pairs instead of 50*49/2 (exact_dedup's job)
    dup = spark.createDataFrame(
        [(i, "the same boilerplate text repeated everywhere today") for i in range(50)],
        "doc_id long, text string",
    )
    assert winnow_pairs(dup, k=K, w=W, min_shared=1, max_df=10).count() == 0
    # with the cap off they all pair
    assert (
        winnow_pairs(dup, k=K, w=W, min_shared=1, max_df=None).count()
        == 50 * 49 // 2
    )


def test_winnow_pairs_reuses_one_exchange(spark):
    from pdf_extractor_spark.operators.dedup import winnow_pairs

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = winnow_pairs(df, k=K, w=W)
    out.collect()  # AQE finalizes exchange reuse at runtime
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan and "ReusedExchange" in plan
    # the index pipeline must not be rebuilt inside an inner broadcast
    import re

    assert not re.search(r"BroadcastHashJoin \[fingerprint[^\n]*Inner", plan)


def test_winnow_pairs_guarantee_randomized(spark):
    """Structural-recall property on 40 randomized cases: ANY two docs
    sharing a contiguous run of >= w+k-1 tokens MUST emit a candidate
    pair (min_shared=1, no hot cap). One batched Spark evaluation."""
    import random

    from pdf_extractor_spark.operators.dedup import winnow_pairs

    rng = random.Random(7)
    vocab = [f"tok{i}" for i in range(200)]
    rows, expected = [], set()
    run_len = W + K - 1
    for case in range(40):
        a, b = 1000 + 2 * case, 1001 + 2 * case
        run = [rng.choice(vocab) for _ in range(run_len + rng.randrange(3))]
        pre_a = [rng.choice(vocab) for _ in range(rng.randrange(8))]
        post_a = [rng.choice(vocab) for _ in range(rng.randrange(8))]
        pre_b = [rng.choice(vocab) for _ in range(rng.randrange(8))]
        post_b = [rng.choice(vocab) for _ in range(rng.randrange(8))]
        rows.append((a, " ".join(pre_a + run + post_a)))
        rows.append((b, " ".join(pre_b + run + post_b)))
        expected.add((a, b))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id1, r.id2)
        for r in winnow_pairs(
            df, k=K, w=W, min_shared=1, max_df=None
        ).collect()
    }
    missing = expected - got
    assert not missing, f"guarantee violated for {sorted(missing)[:5]}"
