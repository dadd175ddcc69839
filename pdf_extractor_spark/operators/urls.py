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

from pyspark.sql import Column, DataFrame
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
