"""label_propagation, expire_snapshots, text_tiling, event_rle."""

import datetime


def test_label_propagation_components(spark):
    from pdf_extractor_spark.operators.graph import label_propagation

    # component {a, b, c} (chain) and component {x, y}
    df = spark.createDataFrame(
        [("b", "a"), ("b", "c"), ("x", "y")], "src string, dst string"
    )
    got = {
        r.host: (r.community, r.community_size)
        for r in label_propagation(df, iters=2).collect()
    }
    assert got["a"] == ("a", 3)
    assert got["b"] == ("a", 3)
    assert got["c"] == ("a", 3)
    assert got["x"] == ("x", 2)
    assert got["y"] == ("x", 2)


def test_label_propagation_bounded_rounds(spark):
    from pdf_extractor_spark.operators.graph import label_propagation

    # path a-b-c-d-e: 2 rounds cannot carry 'a' to 'e' (distance 4);
    # e sees min(c,d,e) = 'c' after round 2 — the documented cutoff
    df = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")],
        "src string, dst string",
    )
    got = {
        r.host: r.community
        for r in label_propagation(df, iters=2).collect()
    }
    assert got["e"] == "c"
    assert got["a"] == "a"


def test_expire_snapshots_policy(spark):
    from pdf_extractor_spark.operators.maintenance import expire_snapshots

    # 15 daily snapshots: last 7 retained as recent; older ones expired
    # except each week's first snapshot (weekly_head)
    d0 = datetime.date(2024, 1, 1)  # a Monday
    rows = [
        (i + 1, d0 + datetime.timedelta(days=i)) for i in range(15)
    ]
    df = spark.createDataFrame(rows, "snapshot_id long, snap_date date")
    got = {
        r.snapshot_id: (r.status, r.reason)
        for r in expire_snapshots(df).collect()
    }
    for sid in range(9, 16):  # last 7 (ids 9..15)
        assert got[sid] == ("retained", "recent"), sid
    # id 1 (Mon Jan 1) and id 8 (Mon Jan 8) are weekly heads
    assert got[1] == ("retained", "weekly_head")
    assert got[8] == ("retained", "weekly_head")
    for sid in (2, 3, 4, 5, 6, 7):
        assert got[sid] == ("expired", "age"), sid


def test_text_tiling_boundary(spark):
    from pdf_extractor_spark.operators.textstats import text_tiling

    # two 4-token blocks with disjoint vocab -> sim 0 -> one boundary
    df = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "a b c")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in text_tiling(df, block_tokens=4).collect()}
    assert (got[1].n_blocks, got[1].n_boundaries, got[1].min_sim) == (
        2, 1, 0.0,
    )
    assert (got[2].n_blocks, got[2].n_boundaries, got[2].min_sim) == (
        1, 0, None,
    )


def test_text_tiling_overlapping_vocab(spark):
    from pdf_extractor_spark.operators.textstats import text_tiling

    # blocks: {a,b,c,d} then {c,d,e,f}: jaccard 2/6 = 0.333333 >= 0.1
    df = spark.createDataFrame(
        [(1, "a b c d c d e f")], "doc_id long, text string"
    )
    r = text_tiling(df, block_tokens=4).collect()[0]
    assert (r.n_boundaries, r.min_sim) == (0, 0.333333)


def test_event_rle_hand_computed(spark):
    from pdf_extractor_spark.operators.events import event_rle

    t0 = datetime.datetime(2024, 1, 1)
    seq = ["view", "view", "view", "click", "view", "view"]
    rows = [
        (i, t0 + datetime.timedelta(seconds=i), 1, typ)
        for i, typ in enumerate(seq)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    r = event_rle(df).collect()[0]
    assert (r.n_events, r.n_runs, r.longest_run) == (6, 3, 3)
    assert r.compress_ratio == 0.5
