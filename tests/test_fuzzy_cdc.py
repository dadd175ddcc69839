"""fuzzy matching (levenshtein / phonetic), CDC chunk dedup, ROUGE-2
overlap — hand-computed parity cases."""

from pdf_extractor_spark.operators.curation import (
    cdc_chunk_dedup,
    cdc_chunks,
    rouge_overlap,
)
from pdf_extractor_spark.operators.fuzzy import (
    levenshtein_name_pairs,
    phonetic_groups,
)


def test_levenshtein_name_pairs(spark):
    rows = [
        (1, "small ring"),
        (2, "smal ring"),   # dist 1 to "small ring"
        (3, "small ring"),  # exact dup collapses into the dictionary row
        (4, "red widget"),  # different block (widget)
        (5, "blue ring"),   # dist 4 to "small ring" — above cap
        (6, None),
    ]
    df = spark.createDataFrame(rows, "p_partkey long, p_name string")
    got = levenshtein_name_pairs(df, "p_name", "p_partkey", max_dist=2)
    out = {(r.name_a, r.name_b): r for r in got.collect()}
    assert set(out) == {("smal ring", "small ring")}
    r = out[("smal ring", "small ring")]
    # "small ring" has 2 corpus rows, "smal ring" has 1; dist 1
    assert (r.dist, r.n_a, r.n_b) == (1, 1, 2)


def test_levenshtein_block_cap(spark):
    rows = [(i, f"v{i} ring") for i in range(6)]
    df = spark.createDataFrame(rows, "p_partkey long, p_name string")
    # block "ring" holds 6 names -> dropped when cap is 5
    assert levenshtein_name_pairs(
        df, "p_name", "p_partkey", max_dist=2, max_block=5
    ).count() == 0
    assert levenshtein_name_pairs(
        df, "p_name", "p_partkey", max_dist=2, max_block=6
    ).count() > 0


def test_phonetic_groups(spark):
    rows = [
        (1, "small ring"),
        (2, "smal ring"),    # SMALL -> S+MLL; SMAL -> S+ML... see below
        (3, "hot gear"),
        (4, "hoot gear"),    # HOT and HOOT share key "HT"
        (5, "a thing"),      # all-vowel word -> key is just "A"
        (6, None),
    ]
    df = spark.createDataFrame(rows, "p_partkey long, p_name string")
    got = {r.pkey: r for r in phonetic_groups(df, "p_name", "p_partkey").collect()}
    # HOT: H + "T" = "HT"; HOOT: H + "T" = "HT" -> same group
    assert got["HT"].n_words == 2
    assert got["HT"].words == "hoot|hot"
    assert got["HT"].n_rows == 2
    # SMALL -> S + "MLL"; SMAL -> S + "ML" -> different keys (no
    # repeat-collapse by design, RE2 has no backreferences)
    assert got["SMLL"].words == "small"
    assert got["SML"].words == "smal"
    assert got["A"].n_words == 1


def test_cdc_chunks_deterministic_and_content_defined(spark):
    # boundary positions precomputed offline with hashlib.md5 (same 60-bit
    # construction): the 20-token base splits 8|2|10; the prefixed copy
    # splits 9|2|10 — boundaries re-synchronize on content, so the two
    # trailing chunks ('iota kappa', 'lam..upsilon') share hashes
    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lam mu nu xi omicron pi rho sigma tau upsilon"
    )
    rows = [(1, base), (2, "prefix " + base)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    chunks = cdc_chunks(df, w=4, modulus=8).collect()
    by_doc = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert sorted(r.n_toks for r in by_doc[1]) == [2, 8, 10]
    assert sorted(r.n_toks for r in by_doc[2]) == [2, 9, 10]
    # chunk_idx is dense from 0
    for d in (1, 2):
        assert sorted(r.chunk_idx for r in by_doc[d]) == list(
            range(len(by_doc[d]))
        )
    shared = {r.chunk_hash for r in by_doc[1]} & {
        r.chunk_hash for r in by_doc[2]
    }
    assert len(shared) == 2


def test_cdc_chunk_dedup_stats(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (3, "totally unrelated words here now indeed truly unique ones"),
        (4, None),
        (5, "   "),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in cdc_chunk_dedup(df, w=4, modulus=8).collect()}
    assert len(got) == 5
    # identical docs: every chunk duplicated
    for d in (1, 2):
        assert got[d].n_tokens == 10
        assert got[d].n_dup_chunks == got[d].n_chunks > 0
        assert got[d].dup_token_ratio == 1.0
    assert got[3].n_dup_chunks == 0 and got[3].dup_token_ratio == 0.0
    for d in (4, 5):
        assert (got[d].n_tokens, got[d].n_chunks, got[d].dup_token_ratio) == (
            0,
            0,
            0.0,
        )


def test_rouge_overlap(spark):
    rows = [
        (1, "a b c d"),          # bigrams {a b, b c, c d}
        (2, "b c d e"),          # bigrams {b c, c d, d e}; overlap with 1: 2
        (3, "x y"),              # bigram {x y}; overlap with 2: 0
        (5, "one"),              # no bigrams -> never a doc_b row
        (6, "p q"),              # doc 5 exists -> pair (5, 6) with 0 overlap
        (8, "r s"),              # doc 7 missing -> no pair
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.doc_a, r.doc_b): r for r in rouge_overlap(df, n=2).collect()}
    assert set(got) == {(1, 2), (2, 3), (5, 6)}
    r12 = got[(1, 2)]
    assert (r12.n_overlap, r12.n_ref) == (2, 3)
    assert abs(r12.rouge_recall - round(2 / 3, 6)) < 1e-12
    assert got[(2, 3)].n_overlap == 0 and got[(2, 3)].rouge_recall == 0.0
    assert got[(5, 6)].n_overlap == 0
