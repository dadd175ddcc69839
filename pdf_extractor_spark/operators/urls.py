"""URL normalization and host-level rollups — the canonicalization step a
web-scale corpus needs before URL-keyed dedup or host-level quality
scoring (a crawl's URL column is the dedup/blocklist key; two spellings of
one URL must normalize to the same string BEFORE any key-equality op).

Rules implemented (the standard safe-normalization subset):
  * scheme and host lowercased (path/query case is preserved — it is
    significant on most servers),
  * default ports stripped (:80 for http, :443 for https); non-default
    ports kept,
  * tracking query parameters (utm_*) removed; remaining parameters kept
    in original order; a now-empty query string drops its '?',
  * fragment stripped (never sent to the server).

Everything is columnar regexp_extract / regexp_replace plus array ops
(split -> filter -> array_join) in whole-stage codegen: a narrow map with
zero shuffle and zero Python, so it runs at scan speed on any corpus
size. Regexes stay in the Java ∩ RE2 dialect so the DuckDB oracle in
__spark_entry__.py executes the identical patterns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _norm_url(url: Column) -> tuple[Column, Column]:
    """(host, normalized_url) column pair for one URL column."""
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)
    path = F.regexp_extract(
        url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1
    )
    query = F.regexp_extract(url, r"\?([^#]*)", 1)
    host = F.lower(F.regexp_replace(hostport, r":[0-9]+$", ""))
    port = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    default_port = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    port_part = F.when(
        (port == "") | default_port, F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))
    kept_params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.startswith("utm_"),
    )
    query_part = F.when(
        F.size(kept_params) > 0,
        F.concat(F.lit("?"), F.array_join(kept_params, "&")),
    ).otherwise(F.lit(""))
    norm = F.concat(scheme, F.lit("://"), host, port_part, path, query_part)
    return host, norm


def url_normalize(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, host, norm_url) — canonicalized URL per document."""
    host, norm = _norm_url(F.col(url_col))
    return df.select(
        F.col(id_col), host.alias("host"), norm.alias("norm_url")
    )


def host_stats(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    chars_col: str = "n_chars",
) -> DataFrame:
    """(host, n_docs, distinct_urls, avg_chars) — per-host rollup over the
    normalized URLs: document count, distinct canonical URLs (the
    URL-level dedup denominator), and mean document length. One hash
    shuffle on the host key with map-side partial aggregation; hosts are
    heavy-hitters in real crawls, but count/avg partials keep the skewed
    key's shuffle payload at one row per (mapper, host)."""
    host, norm = _norm_url(F.col(url_col))
    return (
        df.select(
            host.alias("host"),
            norm.alias("norm_url"),
            F.col(chars_col).alias("_chars"),
        )
        .groupBy("host")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("norm_url").alias("distinct_urls"),
            F.round(F.avg("_chars"), 4).alias("avg_chars"),
        )
        .orderBy("host")
    )


def url_dedup(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """(norm_url, canonical_id, n_fetches) — URL-keyed exact dedup: one
    row per canonical URL with the smallest doc_id as the survivor and
    the fetch count. This is the recrawl-collapse step a crawl pipeline
    runs BEFORE any content dedup — the same page fetched under
    scheme-case / default-port / tracking-param / fragment variations
    must fold to one document, and URL equality is orders of magnitude
    cheaper than content comparison.

    Scale shape: exact_dedup's — normalization is a narrow codegen map,
    then ONE hash shuffle on the canonical URL key with map-side partial
    min/count (a heavily recrawled URL ships one row per mapper, not one
    per fetch)."""
    _, norm = _norm_url(F.col(url_col))
    return (
        df.select(F.col(id_col), norm.alias("norm_url"))
        .groupBy("norm_url")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count("*").cast("long").alias("n_fetches"),
        )
    )


def crawl_schedule(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    delay_s: int = 2,
    seed: str = "politeness",
) -> DataFrame:
    """(doc_id, host, slot, fetch_at_s) — per-host politeness schedule for
    a fetch queue: each host's URLs are serialized into slots and slot k
    fetches at k * delay_s seconds, the crawl-delay contract every polite
    crawler owes a host. The slot order is a SEEDED md5 ranking of the
    normalized URL (ties to doc_id), not ingest order: hash order is
    rerun-stable, engine-mirrorable, and fair — low doc_ids don't
    monopolize the early slots of every host on every recrawl.

    Scale: ONE hash shuffle on host, then a per-host window. The per-host
    sort is not an accident to engineer away — politeness IS per-host
    serialization, so the window partition is exactly the crawler's real
    queue; a mega-host's long queue is bounded upstream by
    `host_quota_sample`, and distinct hosts schedule in parallel."""
    host, norm = _norm_url(F.col(url_col))
    base = df.select(
        F.col(id_col), host.alias("host"), norm.alias("norm_url")
    )
    order = F.md5(
        F.concat_ws(
            "_",
            F.lit(seed),
            F.col("norm_url"),
            F.col(id_col).cast("string"),
        )
    )
    w = Window.partitionBy("host").orderBy(order, F.col(id_col))
    return base.select(
        F.col(id_col),
        "host",
        (F.row_number().over(w) - 1).alias("slot"),
    ).withColumn(
        "fetch_at_s", F.col("slot").cast("long") * F.lit(delay_s)
    )


def url_blocklist(
    df: DataFrame,
    blocklist: tuple[str, ...],
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, host, matched_suffix, blocked) — UT1-style domain
    blocklist filter: a URL is blocked when its host OR ANY parent domain
    appears in the blocklist. Matching is label-suffix, never substring —
    'example.com' blocks 'a.example.com' but NOT 'notexample.com'.
    matched_suffix is the most specific (longest) matching entry, '' when
    clean.

    Scale: real blocklists (UT1 adult/malware ~4M domains) broadcast as
    an exact set; each URL generates its <= |labels| candidate suffixes
    ARRAY-side and probes in place — no explode, no join, no shuffle; the
    corpus pass stays narrow. (For blocklists too large to broadcast the
    same shape becomes a broadcast-hash join on the exploded suffix; the
    probe-side code is unchanged.) Here the list is a plan literal — the
    local stand-in for that broadcast."""
    host, _ = _norm_url(F.col(url_col))
    base = df.select(F.col(id_col), host.alias("host"))
    if not blocklist:
        # empty list is constant-clean, not an empty-array type puzzle
        return base.select(
            F.col(id_col),
            "host",
            F.lit("").alias("matched_suffix"),
            F.lit(False).alias("blocked"),
        )
    labels = F.split(F.col("host"), r"\.")
    suffixes = F.transform(
        F.sequence(F.lit(0), F.size(labels) - 1),
        lambda i: F.array_join(
            F.slice(labels, i + 1, F.size(labels) - i), "."
        ),
    )
    blk = F.array(*[F.lit(b) for b in sorted(set(blocklist))])
    base = base.withColumn("_m", F.filter(suffixes, lambda s: F.array_contains(blk, s)))
    return base.select(
        F.col(id_col),
        "host",
        F.when(F.size("_m") > 0, F.element_at("_m", 1))
        .otherwise(F.lit(""))
        .alias("matched_suffix"),
        (F.size("_m") > 0).alias("blocked"),
    )


def robots_filter(
    pages: DataFrame,
    rules: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, host, path, matched_prefix, fetchable) — robots.txt
    longest-match crawl permission. `pages` is (doc_id, host, path);
    `rules` is (host, directive in {'allow','disallow'}, prefix), one row
    per robots line, prefixes ending at '/' path-segment boundaries (the
    common robots shape; '*'-wildcard lines would explode to segment
    prefixes at parse time in the same way). Standard REP resolution:
    the LONGEST matching prefix wins, an allow beats a disallow of equal
    length, and a path with no matching rule is fetchable.

    Scale: the rules side is robots.txt lines — tiny per host — so it
    BROADCASTS; the page side explodes each path into its ~depth segment
    prefixes (cheap, bounded fan-out) and LEFT-joins (host, prefix)
    against the broadcast with zero shuffle — every page keeps at least
    its '/' candidate row, so rule-less pages flow through to the
    default-allow verdict with no join-back. The winner per page is a
    struct-max partial aggregate (match-length, is_allow, prefix DESC;
    non-matches sink with length -1) over ONE hash shuffle on doc_id.
    """
    segs = F.split(F.col("path"), "/")
    prefixes = F.concat(
        F.array(F.lit("/")),
        F.transform(
            F.sequence(F.lit(2), F.size(segs)),
            lambda i: F.array_join(F.slice(segs, 1, i), "/"),
        ),
    )
    # explode_outer: a null/degenerate path keeps its row (null prefix
    # matches no rule -> default allow) instead of vanishing
    cand = pages.select(
        F.col(id_col), "host", "path", F.explode_outer(prefixes).alias("prefix")
    )
    hit = F.col("directive").isNotNull()
    win = F.max(
        F.struct(
            F.when(hit, F.length("prefix")).otherwise(F.lit(-1)).alias("l"),
            (F.coalesce(F.col("directive"), F.lit("")) == "allow")
            .cast("int")
            .alias("a"),
            F.when(hit, F.col("prefix")).otherwise(F.lit("")).alias("p"),
            F.coalesce(F.col("directive"), F.lit("allow")).alias("d"),
        )
    ).alias("win")
    return (
        cand.join(F.broadcast(rules), ["host", "prefix"], "left")
        .groupBy(id_col, "host", "path")
        .agg(win)
        .select(
            id_col,
            "host",
            "path",
            F.nullif(F.col("win.p"), F.lit("")).alias("matched_prefix"),
            (F.col("win.d") == "allow").alias("fetchable"),
        )
    )
