"""shot_boundaries and events_cube — hand-computed cases."""

import datetime as dt
import hashlib

from pyspark.sql import functions as F

from pdf_extractor_spark.operators.events import events_cube
from pdf_extractor_spark.operators.multimodal import (
    media_from_documents,
    shot_boundaries,
)


def _feat(media_id, idx):
    h = int(hashlib.md5(f"{media_id}:{idx}".encode()).hexdigest()[:15], 16)
    return h % 256


def test_shot_boundaries_matches_reference_impl(spark):
    # doc_id % 3 == 2 -> video; text of 23 chars -> n_frames = 24,
    # sampled every 5: idx 0,5,10,15,20
    rows = [(2, "x" * 23), (5, "y" * 3), (1, "not a video")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    media = media_from_documents(df)
    got = {r.media_id: r for r in shot_boundaries(media, 5, 96).collect()}
    assert set(got) == {"media-2", "media-5"}

    # python reference for media-2
    idxs = [0, 5, 10, 15, 20]
    feats = [_feat("media-2", i) for i in idxs]
    diffs = [abs(b - a) for a, b in zip(feats, feats[1:])]
    shots = 1 + sum(1 for d in diffs if d > 96)
    r = got["media-2"]
    assert r.n_sampled == 5
    assert r.n_shots == shots
    assert abs(r.mean_abs_diff - round(sum(diffs) / len(diffs), 6)) < 1e-9

    # media-5: 3 chars -> n_frames 4 -> only frame 0 -> one 1-frame shot
    r5 = got["media-5"]
    assert (r5.n_sampled, r5.n_shots, r5.longest_shot, r5.mean_abs_diff) == (
        1,
        1,
        1,
        0.0,
    )


def test_events_cube(spark):
    rows = [
        (1, dt.datetime(2024, 1, 7), 1, "view", 2.0),   # Sunday, dow 1
        (2, dt.datetime(2024, 1, 7), 1, "view", 3.0),
        (3, dt.datetime(2024, 1, 8), 2, "click", None),  # Monday, dow 2
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    out = events_cube(df).collect()
    cells = {(r.event_type, r.dow, r.gid): r for r in out}
    # 4 grouping sets: cell, type-only, dow-only, grand
    assert len(out) == 2 + 2 + 2 + 1  # 2 cells + 2 types + 2 dows + grand
    assert cells[("view", 1, 0)].n == 2
    assert cells[("view", 1, 0)].total_value == 5.0
    assert cells[("view", None, 1)].n == 2          # dow rolled up
    assert cells[(None, 2, 2)].n == 1               # type rolled up
    g = cells[(None, None, 3)]
    assert g.n == 3 and g.total_value == 5.0
