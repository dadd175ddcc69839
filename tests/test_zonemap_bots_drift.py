"""zone_map_prune, bot_detect, centroid_drift — hand-computed cases."""

import datetime


def test_zone_map_prune_hand_computed(spark):
    from pdf_extractor_spark.operators.maintenance import (
        synthesize_file_stats,
        zone_map_prune,
    )

    # two files of 2 docs (docs_per_file=2): file0 lens {100, 200}
    # (prunable for [600,900)), file1 lens {650, 950} (scanned, 1 match)
    docs = spark.createDataFrame(
        [
            (0, "a", "s", 100),
            (1, "a", "s", 200),
            (2, "a", "s", 650),
            (3, "a", "s", 950),
        ],
        "doc_id long, text string, source string, n_chars long",
    )
    r = zone_map_prune(
        synthesize_file_stats(docs, docs_per_file=2),
        docs,
        docs_per_file=2,
    ).collect()[0]
    assert (r.n_files, r.n_pruned, r.n_scanned) == (2, 1, 1)
    assert (r.n_false_positive, r.rows_scanned, r.rows_matching) == (0, 2, 1)


def test_zone_map_false_positive(spark):
    from pdf_extractor_spark.operators.maintenance import (
        synthesize_file_stats,
        zone_map_prune,
    )

    # file spans [500, 1000] but contains no row in [600, 900): the zone
    # map cannot prune it -> false positive
    docs = spark.createDataFrame(
        [(0, "a", "s", 500), (1, "a", "s", 1000)],
        "doc_id long, text string, source string, n_chars long",
    )
    r = zone_map_prune(
        synthesize_file_stats(docs, docs_per_file=2),
        docs,
        docs_per_file=2,
    ).collect()[0]
    assert (r.n_scanned, r.n_false_positive, r.rows_matching) == (1, 1, 0)


def test_bot_detect_flags_dense_user(spark):
    from pdf_extractor_spark.operators.events import bot_detect

    t0 = 1_704_067_200_000_000
    rows = []
    # user 1: 12 events, 1s apart -> span 11s < 11*5s -> bot
    for i in range(12):
        rows.append((i, 1, t0 + i * 1_000_000))
    # user 2: 12 events, 10s apart -> span 110s >= 55s -> human
    for i in range(12):
        rows.append((100 + i, 2, t0 + i * 10_000_000))
    # user 3: only 3 events (below min_events)
    for i in range(3):
        rows.append((200 + i, 3, t0 + i * 100_000))
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts_us long")
    out = {r.user_id: r for r in bot_detect(df).collect()}
    assert set(out) == {1}
    assert (out[1].n_events, out[1].span_us, out[1].min_gap_us) == (
        12, 11_000_000, 1_000_000,
    )


def test_bot_synthesis_rewrites_only_bots(spark):
    from pdf_extractor_spark.operators.events import synthesize_bot_traffic

    t0 = datetime.datetime(2024, 3, 1)
    rows = [
        (1, t0, 37, "view"),
        (2, t0 + datetime.timedelta(hours=1), 37, "view"),
        (3, t0, 5, "view"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    got = {
        (r.user_id, r.event_id): r.ts_us
        for r in synthesize_bot_traffic(df).collect()
    }
    base = 1_704_067_200_000_000
    assert got[(37, 1)] == base
    assert got[(37, 2)] == base + 500_000
    assert got[(5, 3)] != base  # organic timestamp kept


def test_centroid_drift_identical_halves(spark):
    from pdf_extractor_spark.operators.similarity import centroid_drift

    # even and odd ids carry the same vector -> cosine exactly 1
    emb = spark.createDataFrame(
        [
            (0, [1.0, 2.0, 3.0], 7),
            (1, [1.0, 2.0, 3.0], 7),
            (2, [0.0, 1.0, 0.0], 8),
            (3, [0.0, 0.0, 1.0], 8),  # orthogonal halves -> cosine 0
        ],
        "vec_id long, embedding array<float>, label int",
    )
    got = {r.label: r for r in centroid_drift(emb).collect()}
    assert got[7].cos_sim == 1.0
    assert (got[7].n_a, got[7].n_b) == (1, 1)
    assert got[8].cos_sim == 0.0
