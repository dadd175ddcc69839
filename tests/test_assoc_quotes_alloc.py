"""assoc_rules, quote_extract, sample_alloc, time_to_convert —
hand-computed cases."""

import datetime


def test_assoc_rules_hand_computed(spark):
    from pdf_extractor_spark.operators.keywords import assoc_rules

    # 4 docs; tokens: x in all 4, y in 3 (with x), z in 1
    df = spark.createDataFrame(
        [(1, "x y"), (2, "x y"), (3, "x y"), (4, "x z")],
        "doc_id long, text string",
    )
    # min_support 0.5 -> frequent singles: x(4), y(3); pair (x,y) n=3
    rows = assoc_rules(df, min_support=(1, 2), top_k=10).collect()
    got = {(r.antecedent, r.consequent): r for r in rows}
    assert set(got) == {("x", "y"), ("y", "x")}
    xy = got[("x", "y")]
    assert (xy.n_pair, xy.n_ante, xy.n_cons) == (3, 4, 3)
    assert xy.confidence == 0.75
    assert xy.lift == 1.0          # 3*4 / (4*3)
    yx = got[("y", "x")]
    assert (yx.confidence, yx.lift) == (1.0, 1.0)


def test_assoc_rules_support_prunes(spark):
    from pdf_extractor_spark.operators.keywords import assoc_rules

    df = spark.createDataFrame(
        [(1, "x y z"), (2, "x q"), (3, "x q"), (4, "x q")],
        "doc_id long, text string",
    )
    rows = assoc_rules(df, min_support=(3, 5), top_k=10).collect()
    # only x(4) and q(3) are frequent; pair (q,x) support 3/4
    assert {(r.antecedent, r.consequent) for r in rows} == {
        ("x", "q"), ("q", "x")
    }


def test_quote_extract_hand_computed(spark):
    from pdf_extractor_spark.operators.layout import quote_extract

    df = spark.createDataFrame(
        [
            (1, 'he said "a b c" and "d e" done'),
            (2, 'unclosed "tail never ends'),
            (3, "no quotes at all"),
        ],
        "doc_id long, qtext string",
    )
    got = {
        r.doc_id: (r.n_quotes, r.quoted_tokens, r.max_quote_tokens)
        for r in quote_extract(df).collect()
    }
    assert got[1] == (2, 5, 3)
    assert got[2] == (0, 0, 0)
    assert got[3] == (0, 0, 0)


def test_quote_synthesis_roundtrip(spark):
    from pdf_extractor_spark.operators.layout import (
        quote_extract,
        synthesize_quotes,
    )

    # 21 tokens, period 19: quote at 0-2, second opens at 19 and is cut
    # short (only tokens 19, 20) -> unclosed, not extracted
    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(21)))],
        "doc_id long, text string",
    )
    q = synthesize_quotes(df).collect()[0].qtext
    assert q.startswith('"t0 t1 t2" t3')
    assert ' "t19 t20' in q and not q.endswith('"')
    r = quote_extract(synthesize_quotes(df)).collect()[0]
    assert (r.n_quotes, r.quoted_tokens, r.max_quote_tokens) == (1, 3, 3)


def test_sample_alloc_sums_to_budget(spark):
    from pdf_extractor_spark.operators.curation import sample_alloc

    # strata sizes 5, 3, 2 with budget 7: exact shares 3.5, 2.1, 1.4 ->
    # bases 3, 2, 1 (sum 6), leftover 1 goes to largest remainder (.5)
    rows = [(i, "en", "s1") for i in range(5)]
    rows += [(100 + i, "en", "s2") for i in range(3)]
    rows += [(200 + i, "fr", "s1") for i in range(2)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, source string")
    got = {
        (r.lang, r.source): r.quota
        for r in sample_alloc(df, budget=7).collect()
    }
    assert got == {("en", "s1"): 4, ("en", "s2"): 2, ("fr", "s1"): 1}
    assert sum(got.values()) == 7


def test_time_to_convert_hand_computed(spark):
    from pdf_extractor_spark.operators.events import time_to_convert

    t0 = datetime.datetime(2024, 1, 1)

    def ev(eid, s, uid, typ):
        return (eid, t0 + datetime.timedelta(seconds=s), uid, typ)

    df = spark.createDataFrame(
        [
            ev(1, 0, 1, "view"), ev(2, 10, 1, "purchase"),   # 10 s
            ev(3, 0, 2, "view"), ev(4, 30, 2, "purchase"),   # 30 s
            ev(5, 5, 3, "view"),                             # never converts
            ev(6, 0, 4, "purchase"), ev(7, 9, 4, "view"),    # purchase BEFORE view
        ],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    r = time_to_convert(df).collect()[0]
    assert (r.n_from_users, r.n_converted) == (4, 2)
    assert r.conv_rate == 0.5
    assert r.median_s == 20.0   # interpolated between 10 and 30
    assert r.p90_s == 28.0      # 10 + 0.9*(30-10)
