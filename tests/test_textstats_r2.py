"""Hand-computed expectations for the round-2 text-analysis operators
(repetition_stats, tfidf_top_terms) — the DuckDB oracle checks parity,
these pin the intended semantics against literal arithmetic."""

import pytest

from pdf_extractor_spark.operators.textstats import (
    repetition_stats,
    tfidf_top_terms,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "a b a b"),       # 4 tokens, 2 distinct; bigrams: ab,ba,ab
            (2, "x y z"),         # no repetition
            (3, ""),              # blank
            (4, None),            # null
            (5, "solo"),          # 1 token -> no bigrams
        ],
        ["doc_id", "text"],
    )


def test_repetition_stats_values(spark, docs):
    got = {
        r.doc_id: (r.dup_unigram_frac, r.top_bigram_share)
        for r in repetition_stats(docs).collect()
    }
    assert got[1] == (0.5, round(2 / 3, 6))   # "a b" appears 2 of 3 bigrams
    assert got[2] == (0.0, round(1 / 2, 6))   # all bigrams unique (share 1/2)
    assert got[3] == (0.0, 0.0)
    assert got[4] == (0.0, 0.0)
    assert got[5] == (0.0, 0.0)


def test_tfidf_top_terms_ranking(spark):
    # 3 docs; "rare" only in doc 1, "common" in all three
    docs = spark.createDataFrame(
        [
            (1, "rare common common"),
            (2, "common other"),
            (3, "common other other"),
        ],
        ["doc_id", "text"],
    )
    out = tfidf_top_terms(docs, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.rank, r.term, r.score))
    # doc 1: rare tf=1 df=1 -> 1*3/1=3.0 beats common tf=2 df=3 -> 2.0
    assert sorted(by_doc[1]) == [(1, "rare", 3.0), (2, "common", 2.0)]
    # doc 3: other tf=2 df=2 -> 3.0 beats common tf=1 df=3 -> 1.0
    assert sorted(by_doc[3]) == [(1, "other", 3.0), (2, "common", 1.0)]
    # doc 2: tie at 1.5 ("common" 1*3/3=1.0, "other" 1*3/2=1.5) -> other first
    assert sorted(by_doc[2]) == [(1, "other", 1.5), (2, "common", 1.0)]


def test_pack_sequences_hand_computed(spark):
    from pdf_extractor_spark.operators.textstats import pack_sequences

    # one shard, budget 10: docs in id order with counts 4,4,4,9,12,1
    # cum_before: 0,4,8,12,21,33 -> packs 0,0,0,1,2,3
    df = spark.createDataFrame(
        [(i, n, 0) for i, n in enumerate([4, 4, 4, 9, 12, 1])],
        "doc_id long, n_tokens long, shard int",
    )
    out = {r.doc_id: r.pack_id for r in pack_sequences(df, budget=10).collect()}
    assert out == {0: 0, 1: 0, 2: 0, 3: 1, 4: 2, 5: 3}


def test_pack_sequences_budget_discipline(spark):
    """On the real corpus: every pack except possibly a shard's last stays
    under budget + max single doc, and packs are contiguous per shard."""
    import __spark_entry__ as entry

    import pyspark.sql.functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    max_doc = docs.agg(
        F.max(F.size(F.split(F.trim("text"), r"\s+")))
    ).collect()[0][0]
    rows = (
        entry.queries()["pack_sequences"](spark, "/root/testdata/sf0.001")
        .orderBy("shard", "pack_id")
        .collect()
    )
    assert len(rows) > 8
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    for shard, packs in by_shard.items():
        ids = [p.pack_id for p in packs]
        assert ids == sorted(ids) and ids == list(range(len(ids)))
        for p in packs[:-1]:
            # greedy-cut invariant: a non-final pack spans from within
            # max_doc of its lower boundary to past its upper boundary,
            # so it holds at least budget - max_doc tokens
            assert p.pack_tokens >= 2048 - max_doc
        for p in packs:
            assert p.pack_tokens > 0


def test_gopher_filter_hand_computed(spark):
    from pdf_extractor_spark.operators.textstats import gopher_filter

    docs = spark.createDataFrame(
        [
            # 12 distinct 3-5 char tokens, 2 stopwords -> accept
            (1, "the cat with dog bird fish goat lion wolf bear frog newt", "en"),
            # too short (3 tokens)
            (2, "the cat sat", "en"),
            # en doc with one stopword -> ok_stop fails
            (3, "cat dog bird fish goat lion wolf bear frog newt the xxx", "en"),
            # same token repeated -> dup-unigram and top-bigram fail
            (4, "spam spam spam spam spam spam spam spam spam spam spam spam", "pt"),
            # digit-heavy -> ok_digit fails
            (5, "111 222 333 444 555 666 777 888 999 000 123 456", "pt"),
            (6, "", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    got = {r["doc_id"]: r.asDict() for r in gopher_filter(docs).collect()}
    assert got[1]["accept"] is True
    assert got[2]["ok_len"] is False and got[2]["accept"] is False
    assert got[3]["ok_stop"] is False and got[3]["ok_len"] is True
    assert got[4]["ok_dup_unigram"] is False
    assert got[4]["ok_top_bigram"] is False
    assert got[4]["ok_stop"] is True  # non-en passes vacuously
    assert got[5]["ok_digit"] is False
    assert got[6] == {
        "doc_id": 6, "ok_len": False, "ok_wordlen": False, "ok_stop": False,
        "ok_dup_unigram": False, "ok_top_bigram": True, "ok_digit": True,
        "accept": False,
    }


def test_hash_lr_matches_pure_python(spark):
    import hashlib

    from pdf_extractor_spark.operators.textstats import (
        HASH_LR_BUCKETS,
        hash_lr_score,
        hash_lr_weights,
    )

    w = hash_lr_weights()
    docs = [
        (1, "The quick brown fox jumps over the lazy dog"),
        (2, "totally unrelated words entirely different content here"),
        (3, ""),
        (4, None),
        (5, "   padded    whitespace   tokens   "),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in hash_lr_score(df).collect()}

    for doc_id, text in docs:
        toks = (text or "").strip().lower().split()
        margin = 0.0
        for t in toks:
            h = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
            margin += w[h % HASH_LR_BUCKETS]
        r = got[doc_id]
        assert r["n_tokens"] == len(toks)
        assert r["margin"] == round(margin, 6)
        assert r["accept"] is (margin > 0)
        if toks:
            assert r["score"] == round(margin / len(toks), 6)
        else:
            assert r["score"] is None


def test_curation_funnel_counts(spark):
    import hashlib

    from pdf_extractor_spark.operators.curation import curation_funnel
    from pdf_extractor_spark.operators.textstats import (
        HASH_LR_BUCKETS,
        hash_lr_weights,
    )

    good = "the cat with dog bird fish goat lion wolf bear frog newt"

    def margin(text):
        w = hash_lr_weights()
        return sum(
            w[int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
              % HASH_LR_BUCKETS]
            for t in text.lower().split()
        )

    rows = [
        (1, good, "en"),          # gopher-accept; lr sign known below
        (2, good, "en"),          # exact duplicate of 1
        (3, "the cat sat", "en"), # gopher-reject (too short)
        (4, "", "en"),            # gopher-reject (empty)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    r = curation_funnel(df).collect()[0].asDict()
    lr_ok = margin(good) > 0
    assert r["n_input"] == 4
    assert r["n_quality"] == 2
    assert r["n_classifier"] == (2 if lr_ok else 0)
    assert r["n_unique"] == (1 if lr_ok else 0)


def test_vocab_coverage_counts(spark):
    from pdf_extractor_spark.operators.textstats import vocab_coverage

    df = spark.createDataFrame(
        [(1, "a a a b"), (2, "a c"), (3, ""), (4, None), (5, "z q")],
        "doc_id long, text string",
    )
    # vocab_size=2 -> top tokens by (count desc, token asc): a(4), b/c/z/q
    # tie at 1 -> b wins lexicographically
    rows = {r.doc_id: r for r in vocab_coverage(df, vocab_size=2).collect()}
    assert rows[1].n_tokens == 4 and rows[1].n_in_vocab == 4
    assert rows[2].n_tokens == 2 and rows[2].n_in_vocab == 1
    assert rows[2].coverage == 0.5
    assert rows[3].n_tokens == 0 and rows[3].coverage == 0.0
    assert rows[4].n_tokens == 0
    assert rows[5].n_in_vocab == 0 and rows[5].coverage == 0.0


def test_vocab_coverage_broadcasts_vocab(spark):
    from pdf_extractor_spark.operators.textstats import vocab_coverage

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        vocab_coverage(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_readability_known_counts(spark):
    from pdf_extractor_spark.operators.textstats import readability

    rows = [
        (1, "The cat sat. The dog ran!"),  # 6 words, 2 sentences, 6 syllables
        (2, ""),  # empty: all zeros
        (3, "shhh shhh"),  # vowel-less words floor at 1 syllable each
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in readability(df).collect()}
    r1 = got[1]
    assert (r1.n_words, r1.n_sentences, r1.n_syllables) == (6, 2, 6)
    # 0.39*6/2 + 11.8*6/6 - 15.59 = 1.17 + 11.8 - 15.59 = -2.62
    assert r1.fk_grade == -2.62
    assert (got[2].n_words, got[2].fk_grade) == (0, 0.0)
    assert got[3].n_syllables == 2


def test_readability_syllables_are_vowel_runs(spark):
    from pdf_extractor_spark.operators.textstats import readability

    # "readability" -> ea|a|i|i|y = 5 vowel runs
    df = spark.createDataFrame([(1, "readability")], "doc_id long, text string")
    assert readability(df).collect()[0].n_syllables == 5


def test_ocr_garble_score_hand_computed(spark):
    from pdf_extractor_spark.operators.textstats import ocr_garble_score

    rows = [
        (1, "a clean readable sentence with vowels."),
        (2, "tkqzxwfgbcdp"),            # 12-consonant run
        (3, "@@##$$%%^^&&**"),          # all symbols
        (4, None),                       # null text
        (5, "bcdfghjklmnpqrst " * 3),    # vowel starvation, 48 letters
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in ocr_garble_score(df).collect()}
    assert not got[1].garbled
    assert got[2].garbled and got[2].max_consonant_run == 12
    assert got[3].garbled and got[3].n_sym == 14 and got[3].n_letters == 0
    assert not got[4].garbled and got[4].n_chars == 0
    assert got[5].garbled and got[5].n_vowels == 0


def test_script_mix_hand_computed(spark):
    from pdf_extractor_spark.operators.textstats import script_mix

    rows = [
        (1, "hello world 42"),
        (2, "данные 中文 data"),   # cyrillic 6, han 2, latin 4
        (3, None),
        (4, "123 456"),            # digits only
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in script_mix(df).collect()}
    assert got[1].dominant_script == "latin" and got[1].n_digit == 2
    r2 = got[2]
    assert (r2.n_cyrillic, r2.n_han, r2.n_latin) == (6, 2, 4)
    assert r2.dominant_script == "cyrillic"
    assert got[3].dominant_script == "none" and got[3].n_latin == 0
    assert got[4].dominant_script == "digit"


def test_script_mix_tie_keeps_earlier_class(spark):
    from pdf_extractor_spark.operators.textstats import script_mix

    # latin and cyrillic tie at 2 chars each: the fixed fold order keeps
    # the earlier class (latin) — strictly-greater update only
    df = spark.createDataFrame([(1, "ab вг")], "doc_id long, text string")
    assert script_mix(df).collect()[0].dominant_script == "latin"


def test_phrase_search_positions_and_repeated_terms(spark):
    from pdf_extractor_spark.operators.textstats import phrase_search

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the cat mat"),
            (2, "cat the cat the cat"),
            (3, "dog only here"),
            (4, None),
        ],
        "doc_id long, text string",
    )
    phrases = spark.createDataFrame(
        [
            (10, "the cat"),       # repeated-term-adjacent phrase
            (11, "cat the cat"),   # phrase with an internal repeat
            (12, "missing pair"),
            (13, ""),              # empty phrase: silently dropped
        ],
        "phrase_id long, phrase string",
    )
    got = {
        (r.phrase_id, r.doc_id): (r.n_matches, r.first_pos)
        for r in phrase_search(docs, phrases).collect()
    }
    # doc1: 'the cat' at 0 and 4; doc2: at 1 and 3
    assert got[(10, 1)] == (2, 0)
    assert got[(10, 2)] == (2, 1)
    # 'cat the cat' overlaps itself in doc2: anchors at 0 and 2
    assert got[(11, 2)] == (2, 0)
    # no hits for the missing phrase, the empty phrase, or doc3/doc4
    assert all(pid not in (12, 13) for pid, _ in got)
    assert all(d != 3 and d != 4 for _, d in got)


# ---- calibration_bins: reliability counts over a scored frame ----

def test_calibration_bins_hand_computed(spark):
    from pdf_extractor_spark.operators.textstats import calibration_bins

    rows = [
        # (score, accept, gold)
        (-1.0, False, False),   # floor((0)*5)=0 -> bin 0
        (-0.05, False, True),   # floor(0.95*5)=4 -> bin 4
        (0.05, True, True),     # floor(1.05*5)=5 -> bin 5
        (0.99, True, False),    # floor(1.99*5)=9 -> bin 9
        (1.0, True, True),      # floor(10)=10 -> clamp 9
        (None, False, False),   # NULL -> bin -1
    ]
    df = spark.createDataFrame(
        rows, "lr_score double, lr_accept boolean, gold boolean"
    )
    out = {
        r.bin: (r.n_docs, r.n_accept, r.n_gold, r.n_both)
        for r in calibration_bins(df).collect()
    }
    assert out == {
        -1: (1, 0, 0, 0),
        0: (1, 0, 0, 0),
        4: (1, 0, 1, 0),
        5: (1, 1, 1, 1),
        9: (2, 2, 1, 1),
    }


def test_calibration_bins_single_small_shuffle(spark):
    from pdf_extractor_spark.operators.textstats import calibration_bins

    df = spark.createDataFrame(
        [(0.1, True, True)], "lr_score double, lr_accept boolean, gold boolean"
    )
    plan = (
        calibration_bins(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "HashAggregate" in plan, plan


# ---- entity_mentions: capitalized-run extraction + corpus rollup ----

def test_entity_mentions_hand_computed(spark):
    from pdf_extractor_spark.operators.textstats import entity_mentions

    rows = [
        ("d1", "the New York skyline and New York rents"),
        ("d2", "visiting New York was Alice Smith idea"),
        ("d3", "ALLCAPS and lowercase never match X9 or A"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = {
        (r.mention, r.mention_len): (r.n_mentions, r.n_docs)
        for r in entity_mentions(df, min_count=1).collect()
    }
    assert out[("New York", 2)] == (3, 2)
    assert out[("Alice Smith", 2)] == (1, 1)
    # ALLCAPS / X9 / bare 'A' fail ^[A-Z][a-z]+$; no 1-token junk runs
    assert all("Allcaps" not in m for m, _ in out)
    assert ("X9", 1) not in out and ("A", 1) not in out


def test_entity_mentions_min_count_prunes(spark):
    from pdf_extractor_spark.operators.textstats import entity_mentions

    df = spark.createDataFrame(
        [("d1", "Alice met Bob and Alice left")],
        "doc_id string, text string",
    )
    out = {r.mention for r in entity_mentions(df, min_count=2).collect()}
    assert out == {"Alice"}


def test_entity_mentions_null_text(spark):
    from pdf_extractor_spark.operators.textstats import entity_mentions

    df = spark.createDataFrame(
        [("d1", None), ("d2", "   ")], "doc_id string, text string"
    )
    assert entity_mentions(df, min_count=1).count() == 0


# ---- wordpiece_encode: greedy longest-match segmentation ----

def test_wordpiece_greedy_longest_match(spark):
    from pdf_extractor_spark.operators.textstats import wordpiece_encode

    df = spark.createDataFrame(
        [("d1", "table Data join x9 re-merge streaming table")],
        "doc_id string, text string",
    )
    out = {r.word: (r.pieces, r.n_pieces, r.n_occurrences)
           for r in wordpiece_encode(df).collect()}
    assert out["table"] == ("table", 1, 2)        # longest beats ta+ble
    assert out["data"] == ("data", 1, 1)          # lowercased input
    assert out["re-merge"] == ("re [UNK] mer ge", 4, 1)  # '-' -> UNK
    assert out["streaming"] == ("str eam ing", 3, 1)
    assert out["x9"] == ("x 9", 2, 1)             # singles fallback


def test_wordpiece_custom_vocab_prefers_longest(spark):
    from pdf_extractor_spark.operators.textstats import wordpiece_encode

    df = spark.createDataFrame([("d1", "abab")], "doc_id string, text string")
    out = wordpiece_encode(df, vocab=("a", "b", "ab", "aba")).collect()[0]
    # greedy: 'aba' first (longest), then 'b' — NOT the 2-piece 'ab ab'
    assert (out.pieces, out.n_pieces) == ("aba b", 2)
