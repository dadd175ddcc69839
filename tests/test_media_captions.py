"""media_captions: hand-computed nearest-text association over interleaved
spans (tie -> following text, boundary media, text-less docs, shuffled
array order), plus the scale pin: exactly ONE Exchange (the doc_id window
shuffle) and no join in the plan."""

from pdf_extractor_spark.operators.multimodal import media_captions

SPAN = "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"


def _doc(doc_id, spans):
    return (doc_id, [(k, t, m, o) for (k, t, m, o) in spans])


DOCS = [
    # media between two texts, nearer to the earlier one
    _doc("d1", [
        ("text", "intro", None, 0),
        ("media", None, "img1", 1),
        ("text", "far away text", None, 5),
    ]),
    # exact tie -> following text wins
    _doc("d2", [
        ("text", "before", None, 0),
        ("media", None, "img2", 1),
        ("text", "after", None, 2),
    ]),
    # media first (no preceding text) and media last (no following text)
    _doc("d3", [
        ("media", None, "lead", 0),
        ("text", "only text", None, 1),
        ("media", None, "trail", 2),
    ]),
    # no text spans at all -> null caption
    _doc("d4", [
        ("media", None, "alone", 0),
        ("media", None, "alone2", 3),
    ]),
    # SHUFFLED array order (corpus stores spans permuted): same semantics
    _doc("d5", [
        ("text", "tail", None, 4),
        ("media", None, "mid", 2),
        ("text", "head", None, 0),
    ]),
]


def _collect(spark):
    df = spark.createDataFrame(DOCS, SPAN)
    return {r.media_ref: r for r in media_captions(df).collect()}


def test_nearest_and_ties(spark):
    out = _collect(spark)
    # d1: dist to "intro"=1, to far text=4 -> previous
    assert out["img1"].caption == "intro" and out["img1"].caption_side == "prev"
    # d2: tie -> following
    assert out["img2"].caption == "after" and out["img2"].caption_side == "next"
    # d3 boundaries
    assert out["lead"].caption == "only text" and out["lead"].caption_side == "next"
    assert out["trail"].caption == "only text" and out["trail"].caption_side == "prev"


def test_textless_doc_yields_nulls(spark):
    out = _collect(spark)
    for ref in ("alone", "alone2"):
        r = out[ref]
        assert r.caption is None and r.caption_offset is None
        assert r.caption_side is None


def test_shuffled_span_order_is_irrelevant(spark):
    out = _collect(spark)
    # d5: media at offset 2, "head"@0 dist 2, "tail"@4 dist 2 -> tie -> next
    assert out["mid"].caption == "tail" and out["mid"].caption_side == "next"


def test_one_shuffle_no_join(spark):
    df = spark.createDataFrame(DOCS, SPAN)
    plan = (
        media_captions(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1
    assert "Join" not in plan


def test_media_dedup_groups_exact_copies(spark):
    from pdf_extractor_spark.operators.multimodal import media_dedup

    media = spark.createDataFrame(
        [
            ("m1", "image", bytearray(b"samebytes")),
            ("m2", "video", bytearray(b"samebytes")),
            ("m3", "image", bytearray(b"other")),
        ],
        "media_id string, kind string, payload binary",
    )
    rows = {r.first_media_id: r for r in media_dedup(media).collect()}
    assert rows["m1"].n_copies == 2 and rows["m1"].kinds == "image,video"
    assert rows["m3"].n_copies == 1 and rows["m3"].kinds == "image"


def test_media_dedup_shuffles_digests_not_payloads(spark):
    """Scale pin: the exchange must carry the 16-byte digest, never the
    payload bytes — the digest is computed below the shuffle."""
    from pdf_extractor_spark.operators.multimodal import (
        media_dedup,
        media_from_documents,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = media_dedup(media_from_documents(docs))
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re

    ex = re.search(r"Exchange hashpartitioning\(([^)]*)", plan)
    # the key is the md5 grouping expression (printed as
    # _groupingexpression), never the payload column
    assert ex and "payload" not in ex.group(1) and "text" not in ex.group(1)
    # md5 + partial aggregation sit BELOW the exchange (plan prints
    # top-down, so the digest projection appears after it)
    assert plan.index("md5(") > plan.index("Exchange hashpartitioning")
    assert "partial_count" in plan


def test_media_phash_clusters_content_duplicates(spark):
    from pdf_extractor_spark.operators.multimodal import (
        extract_media_features,
        media_phash,
    )

    media = spark.createDataFrame(
        [
            ("m1", "image", bytearray(b"hello world content")),
            ("m2", "image", bytearray(b"hello world content")),  # exact
            ("m3", "image", bytearray(b"completely different bytes here!")),
        ],
        "media_id string, kind string, payload binary",
    )
    rows = {r.first_media_id: r for r in
            media_phash(extract_media_features(media, dim=8)).collect()}
    assert rows["m1"].n_items == 2  # m1+m2 share a signature
    total = sum(r.n_items for r in rows.values())
    assert total == 3


def test_media_phash_matches_manual_bits(spark):
    from pdf_extractor_spark.operators.multimodal import (
        _fake_decode,
        extract_media_features,
        media_phash,
    )

    payload = b"0123456789abcdef"
    feats = _fake_decode(payload, 8)
    want = sum((1 << k) for k, x in enumerate(feats) if x >= 0.5)
    media = spark.createDataFrame(
        [("m1", "image", bytearray(payload))],
        "media_id string, kind string, payload binary",
    )
    got = media_phash(extract_media_features(media, dim=8)).collect()[0]
    assert got.phash == want


def test_multimodal_pack_cost_hand_computed(spark):
    from pyspark.sql import functions as F

    from pdf_extractor_spark.operators.multimodal import multimodal_pack_cost

    df = spark.createDataFrame(
        [(1, [("text", "a b c", None, 0), ("media", None, "m1", 1),
              ("text", "", None, 2), ("media", None, "m2", 3)]),
         (2, [("media", None, "m3", 0)]),
         (3, [("text", None, None, 0)])],
        "doc_id long, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    got = {
        r.doc_id: r.cost
        for r in df.select(
            "doc_id",
            multimodal_pack_cost(F.col("spans"), image_budget=64).alias(
                "cost"
            ),
        ).collect()
    }
    # doc 1: 3 text tokens + '' -> 0 tokens + 2 media * 64;  doc 2: 1 media;
    # doc 3: null text span -> 0 tokens, 0 media
    assert got == {1: 3 + 128, 2: 64, 3: 0}


# ---- audio_segments: gaps-and-islands VAD over the fake-decode wave ----

def test_audio_segments_hand_computed(spark):
    from pdf_extractor_spark.operators.multimodal import audio_segments

    # window=4, min_voiced=3. Wave "aaaa bbb aaaa....": frames of 4 chars.
    #   "abcd" voiced(4) | "ef h" voiced(3) | "  ij" silent(2) | "klmn"
    #   voiced(4) -> segments [0..1] and [3..3]
    wave = "abcdef h  ijklmn"
    df = spark.createDataFrame(
        [("m1", "audio", bytearray(wave, "utf-8")),
         ("m2", "image", bytearray(wave, "utf-8")),   # non-audio: dropped
         ("m3", "audio", None),                        # null payload: dropped
         ("m4", "audio", bytearray(b""))],             # empty: dropped
        "media_id string, kind string, payload binary",
    )
    out = audio_segments(df, window=4, min_voiced=3).collect()
    got = {(r.media_id, r.seg_idx): (r.start_win, r.end_win, r.n_windows,
                                     r.voiced_chars) for r in out}
    assert got == {
        ("m1", 1): (0, 1, 2, 7),
        ("m1", 2): (3, 3, 1, 4),
    }


def test_audio_segments_all_silence_empty(spark):
    from pdf_extractor_spark.operators.multimodal import audio_segments

    df = spark.createDataFrame(
        [("m1", "audio", bytearray(b"    \t\t\n\n    "))],
        "media_id string, kind string, payload binary",
    )
    assert audio_segments(df, window=4, min_voiced=3).count() == 0


def test_audio_segments_single_exchange(spark):
    """The rank window and the island group-by share the media_id hash
    partitioning: exactly ONE Exchange in the physical plan."""
    from pdf_extractor_spark.operators.multimodal import audio_segments

    df = spark.createDataFrame(
        [("m1", "audio", bytearray(b"abcdefgh"))],
        "media_id string, kind string, payload binary",
    )
    plan = (
        audio_segments(df, window=4, min_voiced=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    n_exchange = plan.count("Exchange hashpartitioning")
    assert n_exchange == 1, plan


# ---- media_phash_neardup: hamming-1 cluster pair volume ----

def test_phash_neardup_hand_computed(spark):
    """Features chosen so the signatures are 0b001, 0b011 (x2 items) and
    0b111: hamming-1 pairs are (1,3) with 1*2 items and (3,7) with 2*1;
    (1,7) is hamming 2 and must NOT appear."""
    from pdf_extractor_spark.operators.multimodal import media_phash_neardup

    lo, hi = 0.0, 1.0
    rows = [
        ("a", [hi, lo, lo]),   # 0b001 = 1
        ("b", [hi, hi, lo]),   # 0b011 = 3
        ("c", [hi, hi, lo]),   # 0b011 = 3
        ("d", [hi, hi, hi]),   # 0b111 = 7
    ]
    df = spark.createDataFrame(rows, "media_id string, feature array<float>")
    out = {
        (r.phash_a, r.phash_b): r.n_pairs
        for r in media_phash_neardup(df, bits=3).collect()
    }
    assert out == {(1, 3): 2, (3, 7): 2}


def test_phash_neardup_null_features_excluded(spark):
    from pdf_extractor_spark.operators.multimodal import media_phash_neardup

    df = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("b", None)],
        "media_id string, feature array<float>",
    )
    assert media_phash_neardup(df, bits=2).count() == 0
