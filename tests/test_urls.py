"""Hand-computed URL normalization cases, including every rule's edge."""


def _u(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, url string, n_chars long")


def test_url_normalize_hand_computed(spark):
    from pdf_extractor_spark.operators.urls import url_normalize

    docs = _u(
        spark,
        [
            # https default port stripped, host+scheme lowercased,
            # fragment dropped, utm_* dropped, real param kept
            (1, "HTTPS://WWW.Ex.COM:443/A/b?utm_source=x&id=7#frag", 0),
            # http with :443 is NOT the default -> port kept
            (2, "http://ex.com:443/p", 0),
            # http default port stripped
            (3, "HTTP://EX.com:80/p?a=1&b=2", 0),
            # only tracking params -> the whole query (and '?') drops
            (4, "https://ex.com/p?utm_a=1&utm_b=2", 0),
            # path case preserved, non-default port kept
            (5, "https://Ex.Com:8443/CaseSensitive/Path", 0),
            # no port, no query, no fragment: unchanged except case
            (6, "https://ex.com/x", 0),
        ],
    )
    got = {
        r["doc_id"]: (r["host"], r["norm_url"])
        for r in url_normalize(docs).collect()
    }
    assert got[1] == ("www.ex.com", "https://www.ex.com/A/b?id=7")
    assert got[2] == ("ex.com", "http://ex.com:443/p")
    assert got[3] == ("ex.com", "http://ex.com/p?a=1&b=2")
    assert got[4] == ("ex.com", "https://ex.com/p")
    assert got[5] == ("ex.com", "https://ex.com:8443/CaseSensitive/Path")
    assert got[6] == ("ex.com", "https://ex.com/x")


def test_host_stats_hand_computed(spark):
    from pdf_extractor_spark.operators.urls import host_stats

    docs = _u(
        spark,
        [
            # same canonical URL spelled two ways -> 1 distinct URL
            (1, "HTTPS://A.com:443/p?utm_x=1", 10),
            (2, "https://a.COM/p", 30),
            (3, "https://a.com/q", 20),
            (4, "https://b.com/p", 40),
        ],
    )
    got = {
        r["host"]: (r["n_docs"], r["distinct_urls"], r["avg_chars"])
        for r in host_stats(docs).collect()
    }
    assert got == {"a.com": (3, 2, 20.0), "b.com": (1, 1, 40.0)}


def test_url_dedup_hand_computed(spark):
    from pdf_extractor_spark.operators.urls import url_dedup

    docs = _u(
        spark,
        [
            # four spellings of ONE canonical URL
            (5, "HTTPS://A.com:443/p?utm_x=1", 0),
            (2, "https://a.COM/p", 0),
            (9, "https://a.com/p#frag", 0),
            (4, "https://a.com/p?utm_source=x&utm_id=2", 0),
            # a kept (non-utm) param is part of the key
            (1, "https://a.com/p?id=1", 0),
            (3, "https://b.com/p", 0),
        ],
    )
    got = {
        r["norm_url"]: (r["canonical_id"], r["n_fetches"])
        for r in url_dedup(docs).collect()
    }
    assert got == {
        "https://a.com/p": (2, 4),
        "https://a.com/p?id=1": (1, 1),
        "https://b.com/p": (3, 1),
    }


def test_url_blocklist_suffix_not_substring(spark):
    from pdf_extractor_spark.operators.urls import url_blocklist

    rows = [
        (1, "https://a.bad.example.com/x"),   # parent-domain match
        (2, "https://bad.example.com/x"),     # exact match
        (3, "https://notbad.example.com/x"),  # substring must NOT match
        (4, "https://clean.org/x"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {r.doc_id: r for r in url_blocklist(df, ("bad.example.com",)).collect()}
    assert got[1].blocked and got[1].matched_suffix == "bad.example.com"
    assert got[2].blocked
    assert not got[3].blocked and got[3].matched_suffix == ""
    assert not got[4].blocked


def test_url_blocklist_longest_match_and_empty_list(spark):
    from pdf_extractor_spark.operators.urls import url_blocklist

    df = spark.createDataFrame(
        [(1, "https://x.sub.dom.net/")], "doc_id long, url string"
    )
    r = url_blocklist(df, ("dom.net", "sub.dom.net")).collect()[0]
    # most specific entry wins the report (both block)
    assert r.blocked and r.matched_suffix == "sub.dom.net"
    r2 = url_blocklist(df, ()).collect()[0]
    assert not r2.blocked and r2.matched_suffix == ""


def test_crawl_schedule_per_host_slots(spark):
    from pdf_extractor_spark.operators.urls import crawl_schedule

    df = spark.createDataFrame(
        [
            (1, "https://a.com/x"),
            (2, "https://a.com/y"),
            (3, "https://a.com/z"),
            (4, "https://b.com/only"),
        ],
        "doc_id long, url string",
    )
    rows = crawl_schedule(df, delay_s=5).collect()
    by_host = {}
    for r in rows:
        by_host.setdefault(r.host, []).append((r.slot, r.fetch_at_s, r.doc_id))
    # slots are 0..n-1 per host, fetch_at = slot * delay
    a = sorted(by_host["a.com"])
    assert [s for s, _, _ in a] == [0, 1, 2]
    assert [t for _, t, _ in a] == [0, 5, 10]
    assert by_host["b.com"] == [(0, 0, 4)]
    # hash order, not id order: the seeded ranking must be a permutation
    # decided by md5, so assert determinism across two runs instead
    again = {
        (r.doc_id, r.slot) for r in crawl_schedule(df, delay_s=5).collect()
    }
    assert again == {(r.doc_id, r.slot) for r in rows}


# ---- robots_filter: REP longest-match resolution ----

def _robots(spark, pages, rules):
    from pdf_extractor_spark.operators.urls import robots_filter

    p = spark.createDataFrame(pages, "doc_id long, host string, path string")
    r = spark.createDataFrame(
        rules, "host string, directive string, prefix string"
    )
    return {
        row.doc_id: (row.matched_prefix, row.fetchable)
        for row in robots_filter(p, r).collect()
    }


def test_robots_longest_match_wins(spark):
    rules = [
        ("h", "disallow", "/"),
        ("h", "allow", "/a"),
        ("h", "disallow", "/a/b"),
    ]
    got = _robots(
        spark,
        [(1, "h", "/a/b/c"), (2, "h", "/a/x"), (3, "h", "/z")],
        rules,
    )
    assert got[1] == ("/a/b", False)   # deepest rule wins
    assert got[2] == ("/a", True)      # allow overrides root disallow
    assert got[3] == ("/", False)      # only the root rule matches


def test_robots_allow_beats_disallow_on_equal_length(spark):
    rules = [("h", "disallow", "/a"), ("h", "allow", "/b")]
    # same-length allow+disallow on the SAME prefix
    rules += [("h", "disallow", "/c"), ("h", "allow", "/c")]
    got = _robots(spark, [(1, "h", "/c/x")], rules)
    assert got[1] == ("/c", True)


def test_robots_no_match_defaults_allow(spark):
    got = _robots(
        spark,
        [(1, "h", "/a"), (2, "other", "/a")],
        [("h", "disallow", "/b")],
    )
    assert got[1] == (None, True)
    assert got[2] == (None, True)


def test_robots_null_path_survives_as_allow(spark):
    got = _robots(spark, [(1, "h", None)], [("h", "disallow", "/")])
    assert got[1] == (None, True)


def test_robots_plan_broadcast_single_exchange(spark):
    """Rules broadcast; the only Exchange is the doc-key aggregate."""
    from pdf_extractor_spark.operators.urls import robots_filter

    p = spark.createDataFrame(
        [(1, "h", "/a/b")], "doc_id long, host string, path string"
    )
    r = spark.createDataFrame(
        [("h", "disallow", "/")], "host string, directive string, prefix string"
    )
    plan = (
        robots_filter(p, r)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan
