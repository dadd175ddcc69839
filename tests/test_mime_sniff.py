"""Magic-byte MIME detection (multimodal.media_mime_sniff): every rule
of the public magic-number table on hand-built payloads, the RIFF and
ftyp disambiguations, precedence, and null/empty edges."""


def _media(spark, rows):
    return spark.createDataFrame(
        [(i, bytearray(p) if p is not None else None)
         for i, p in enumerate(rows)],
        "media_id long, payload binary",
    )


def _sniff(spark, rows):
    from pdf_extractor_spark.operators.multimodal import media_mime_sniff

    out = media_mime_sniff(_media(spark, rows), id_col="media_id")
    return [r.mime for r in out.orderBy("media_id").collect()]


def test_magic_table_rules(spark):
    cases = [
        (bytes.fromhex("89504E470D0A1A0A") + b"x", "image/png"),
        (bytes.fromhex("FFD8FFE000104A464946") + b"x", "image/jpeg"),
        (b"GIF89a" + b"x", "image/gif"),
        (b"GIF87a" + b"x", "image/gif"),
        (b"%PDF-1.7 rest", "application/pdf"),
        (b"PK\x03\x04zipdata", "application/zip"),
        (bytes.fromhex("1A45DFA3") + b"x", "video/webm"),
        (b"ID3\x04tag", "audio/mpeg"),
        (b"OggSpage", "audio/ogg"),
    ]
    assert _sniff(spark, [p for p, _ in cases]) == [m for _, m in cases]


def test_riff_and_ftyp_disambiguation(spark):
    cases = [
        (b"RIFF\x24\x08\x00\x00WAVEfmt ", "audio/wav"),
        (b"RIFF\x24\x08\x00\x00AVI LIST", "video/avi"),
        # RIFF with an unknown inner tag is neither wav nor avi
        (b"RIFF\x24\x08\x00\x00WEBPVP8 ", "application/octet-stream"),
        (b"\x00\x00\x00\x18ftypisom\x00\x00", "video/mp4"),
        (b"\x00\x00\x00\x20ftypmp42more", "video/mp4"),
    ]
    assert _sniff(spark, [p for p, _ in cases]) == [m for _, m in cases]


def test_unknown_null_and_empty(spark):
    assert _sniff(
        spark, [b"plain text here", b"", None]
    ) == ["application/octet-stream", None, None]


def test_magic_hex_and_n_bytes_columns(spark):
    from pdf_extractor_spark.operators.multimodal import media_mime_sniff

    out = media_mime_sniff(
        _media(spark, [b"%PDF-1.4 tail"]), id_col="media_id"
    ).collect()[0]
    assert out.magic_hex == "25504446"
    assert out.n_bytes == 13
