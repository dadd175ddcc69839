"""HTML boilerplate stripping / DOM-heuristic main-content extraction.

North-rule component: "main-content extraction pipeline (HTML boilerplate
strip, PDF/layout parse, DOM heuristics)". The reference engine keeps only
content spans per page (reference src/core/extractor.py:46-75 drops
out-of-range pages and rebuilds the span sequence); this module is the web
analogue: segment a raw HTML document into DOM blocks, score each block
with the classic text-density / link-density heuristics (Arc90
readability, JusText, Boilerpipe — all public), and keep only the content
blocks.

Scale design (the point at 10^12 docs): the whole strip is per-row
higher-order-function work — regexp noise removal, one split into block
fragments, chained `transform` stages for features, `filter` + `array_join`
for reassembly. NO shuffle, NO UDF, no explode in the main-content path, so
the operator is a narrow map over the scan: it scales linearly with
executors and AQE/skew handling never engages. `html_blocks` (the per-block
inspection surface) adds a single posexplode, still narrow.

Parity design: every regex is in the Java-regex ∩ RE2 common subset (no
backreferences — the script/style/noscript closers are spelled per tag; no
lookaround), so the SAME pattern strings run in DuckDB's regexp engine and
the whole operator has a cross-engine SQL oracle. Block indexes are
assigned AFTER dropping empty-text fragments, so Java-vs-RE2 differences in
empty-fragment emission around adjacent delimiters cannot break parity.

Catalyst notes (see tests/test_plans.py and the round-1 lesson in
textstats.py): the feature pipeline is three CHAINED transforms so each
expensive value (collapsed text, anchor-length sum) is materialized as a
struct field before being referenced more than once, and the final blocks
array is bound with withColumn so CollapseProject cannot re-inline it into
every consumer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Block-level elements: a tag boundary of any of these splits the document
# into block fragments. Longest-prefix entries (thead before th, etc.) are
# ordered so Java's leftmost-first and RE2's matching agree; the trailing
# [\s/>] guard makes the match unambiguous either way.
BLOCK_TAGS = (
    "p|div|h[1-6]|ul|ol|li|br|table|thead|tbody|tr|td|th|section|article"
    "|header|footer|nav|aside|main|figure|figcaption|blockquote"
)
BLOCK_SPLIT_RE = rf"(?i)</?(?:{BLOCK_TAGS})(?:\s[^>]*)?/?>"

# Inner HTML of anchors; group 1 is the anchor text (may contain inline tags).
ANCHOR_RE = r"(?is)<a(?:\s[^>]*)?>(.*?)</a>"

INLINE_TAG_RE = r"<[^>]*>"
# Explicit class instead of \s: Java \s includes \x0B, RE2 \s does not.
WS_RE = r"[ \t\r\n\f]+"

DEFAULT_MIN_TEXT_LEN = 25
DEFAULT_MAX_LINK_DENSITY = 0.33


def strip_noise(html: Column) -> Column:
    """Remove script/style/noscript elements and HTML comments.

    Spelled per tag (three regexes) rather than with a backreference so the
    identical patterns run under RE2 in the DuckDB oracle."""
    out = html
    for tag in ("script", "style", "noscript"):
        out = F.regexp_replace(
            out, rf"(?is)<{tag}(?:\s[^>]*)?>.*?</{tag}>", " "
        )
    return F.regexp_replace(out, r"(?s)<!--.*?-->", " ")


def _collapse(txt: Column) -> Column:
    return F.trim(F.regexp_replace(txt, WS_RE, " "))


def html_block_features(
    df: DataFrame,
    html_col: str = "html",
    min_text_len: int = DEFAULT_MIN_TEXT_LEN,
    max_link_density: float = DEFAULT_MAX_LINK_DENSITY,
) -> DataFrame:
    """Add a `blocks` column: array<struct<txt, text_len, link_len,
    link_density, keep>> of the NONEMPTY-text DOM blocks of `html_col`,
    in document order.

    keep = text_len >= min_text_len AND link_density <= max_link_density —
    the standard two-signal boilerplate rule (long, link-sparse blocks are
    content; short or link-dense blocks are chrome/navigation)."""
    cleaned = strip_noise(F.coalesce(F.col(html_col), F.lit("")))
    fragments = F.split(cleaned, BLOCK_SPLIT_RE)

    # Stage 1: materialize the collapsed text per fragment (referenced by
    # length, keep, and the output — compute it exactly once).
    stage1 = F.transform(
        fragments,
        lambda b: F.struct(
            b.alias("raw"),
            _collapse(F.regexp_replace(b, INLINE_TAG_RE, " ")).alias("txt"),
        ),
    )
    # Stage 2: per-block integer features. The anchor-length sum is the
    # other expensive value; it lands in a struct field before reuse.
    stage2 = F.transform(
        stage1,
        lambda s: F.struct(
            s["txt"].alias("txt"),
            F.length(s["txt"]).alias("text_len"),
            F.aggregate(
                F.regexp_extract_all(s["raw"], F.lit(ANCHOR_RE), F.lit(1)),
                F.lit(0),
                lambda acc, a: acc
                + F.length(
                    _collapse(F.regexp_replace(a, INLINE_TAG_RE, " "))
                ),
            ).alias("link_len"),
        ),
    )
    # Stage 3: cheap arithmetic over materialized ints; duplication is free.
    feats = F.transform(
        F.filter(stage2, lambda s: s["text_len"] > 0),
        lambda s: F.struct(
            s["txt"].alias("txt"),
            s["text_len"].alias("text_len"),
            s["link_len"].alias("link_len"),
            (s["link_len"].cast("double") / s["text_len"]).alias(
                "link_density"
            ),
            (
                (s["text_len"] >= F.lit(min_text_len))
                & (
                    s["link_len"].cast("double")
                    <= F.lit(float(max_link_density)) * s["text_len"]
                )
            ).alias("keep"),
        ),
    )
    # withColumn = projection boundary: consumers reference the bound array,
    # not N inlined copies of the whole transform chain.
    return df.withColumn("blocks", feats)


def html_blocks(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    min_text_len: int = DEFAULT_MIN_TEXT_LEN,
    max_link_density: float = DEFAULT_MAX_LINK_DENSITY,
) -> DataFrame:
    """Per-block inspection rows: (doc_id, block_idx, txt, text_len,
    link_len, link_density, keep). block_idx is 0-based over the
    nonempty-text blocks in document order. One posexplode; still narrow."""
    feats = html_block_features(
        df, html_col, min_text_len, max_link_density
    )
    return feats.select(
        F.col(id_col),
        F.posexplode("blocks").alias("block_idx", "b"),
    ).select(
        id_col,
        "block_idx",
        F.col("b.txt").alias("txt"),
        F.col("b.text_len").alias("text_len"),
        F.col("b.link_len").alias("link_len"),
        F.round("b.link_density", 6).alias("link_density"),
        F.col("b.keep").alias("keep"),
    )


def html_main_content(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    min_text_len: int = DEFAULT_MIN_TEXT_LEN,
    max_link_density: float = DEFAULT_MAX_LINK_DENSITY,
) -> DataFrame:
    """Boilerplate-stripped main content per document: (doc_id, main_text,
    n_blocks, n_kept, kept_len, total_len, boiler_ratio).

    main_text joins the kept blocks with newlines; boiler_ratio is the
    fraction of visible text discarded as boilerplate. Entirely per-row:
    zero shuffle at any corpus size."""
    feats = html_block_features(
        df, html_col, min_text_len, max_link_density
    )
    kept = F.filter(F.col("blocks"), lambda s: s["keep"])
    out = feats.withColumn("_kept", kept)
    total_len = F.aggregate(
        F.col("blocks"), F.lit(0), lambda acc, s: acc + s["text_len"]
    )
    kept_len = F.aggregate(
        F.col("_kept"), F.lit(0), lambda acc, s: acc + s["text_len"]
    )
    out = out.withColumn("kept_len", kept_len.cast("long")).withColumn(
        "total_len", total_len.cast("long")
    )
    return out.select(
        F.col(id_col),
        F.array_join(
            F.transform(F.col("_kept"), lambda s: s["txt"]), "\n"
        ).alias("main_text"),
        F.size("blocks").cast("long").alias("n_blocks"),
        F.size("_kept").cast("long").alias("n_kept"),
        F.col("kept_len"),
        F.col("total_len"),
        F.round(
            F.when(F.col("total_len") > 0,
                   1.0 - F.col("kept_len") / F.col("total_len"))
            .otherwise(F.lit(0.0)),
            6,
        ).alias("boiler_ratio"),
    )


LINK_RE = r'(?is)<a\s[^>]*?href="([^"]*)"[^>]*>(.*?)</a>'


def extract_links(
    pages: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """Outlink extraction: (doc_id, link_idx, href, anchor) — one row per
    <a href=...> anchor in document order, anchor text stripped of inline
    tags and whitespace-collapsed. This is the web-graph feeder (link
    graph, anchor-text index, PageRank-style host quality) of a crawl
    curation pipeline.

    Scale shape: two regex passes over the page plus one generate — a
    narrow per-row map with NO shuffle, so it scales linearly with
    executors like the rest of the HTML family. Both regex passes run over
    the SAME materialized page column (withColumn projection boundaries —
    see the round-1 Catalyst re-inlining lesson in textstats.py), and the
    explode is posexplode_outer + null-filter so InferFiltersFromGenerate
    cannot push the array expression into a pre-generate filter (round-2
    winnowing lesson).

    LINK_RE stays in the Java-regex ∩ RE2 subset (lazy quantifiers only, no
    lookaround/backrefs) so the identical pattern string drives the DuckDB
    oracle."""
    out = (
        pages.withColumn(
            "_hrefs", F.regexp_extract_all(F.col(html_col), F.lit(LINK_RE), 1)
        )
        .withColumn(
            "_texts", F.regexp_extract_all(F.col(html_col), F.lit(LINK_RE), 2)
        )
        .select(
            F.col(id_col),
            F.posexplode_outer("_hrefs").alias("link_idx", "href"),
            F.col("_texts"),
        )
        .where(F.col("href").isNotNull())
    )
    raw_anchor = F.get("_texts", F.col("link_idx"))
    return out.select(
        F.col(id_col),
        F.col("link_idx"),
        F.col("href"),
        _collapse(F.regexp_replace(raw_anchor, INLINE_TAG_RE, " ")).alias(
            "anchor"
        ),
    )


def anchor_text_index(links: DataFrame) -> DataFrame:
    """(href, n_links, n_docs, top_anchor) — the anchor-text index over an
    `extract_links` output: per link target, total in-links, distinct
    linking documents, and the most common anchor text (ties broken
    lexicographically). Aggregated anchor text is the classic external
    description of a page (the web-IR signal crawl rankers use).

    Shape: a (href, anchor) partial-aggregating count feeding a min_by
    argmax (count-ties break to the lexicographically smallest anchor via
    a (-count, anchor) struct key — no window), plus a distinct-doc count
    per href joined back. n_docs is NOT decomposable through the
    (href, anchor) grouping (one doc linking a target under two anchors
    must count once), hence the separate aggregation."""
    per = links.groupBy("href", "anchor").agg(F.count("*").alias("c"))
    top = per.groupBy("href").agg(
        F.sum("c").cast("long").alias("n_links"),
        F.min_by(
            "anchor", F.struct((-F.col("c")).alias("nc"), F.col("anchor"))
        ).alias("top_anchor"),
    )
    docs = links.groupBy("href").agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    return top.join(docs, "href").select(
        "href", "n_links", "n_docs", "top_anchor"
    )


def synthesize_html(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic web page per document row, built columnar from
    (doc_id, text, source): header/nav/aside/ads/share/footer boilerplate
    (short or link-dense blocks) around an <article> whose two paragraphs
    carry the document text split at the midpoint. Scripts, styles, and
    comments are seeded so strip_noise has real work.

    This is the prompt-mandated synthetic input for the HTML family (the
    driver corpus carries plain text, not web pages); the construction is
    pure concat/substring so the DuckDB oracle rebuilds the identical page.
    Assumes the corpus text contains no '<', '>' or '&' (true of the driver
    tables; checked in tests)."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    n = F.length(t)
    half = F.greatest(F.floor(n / 2).cast("int"), F.lit(1))
    p1 = F.substring(t, F.lit(1), half)
    p2 = F.substring(t, half + 1, n)
    did = F.col(id_col).cast("string")
    src = F.coalesce(F.col("source"), F.lit(""))
    extra = F.when(
        F.col(id_col) % 3 == 0, F.lit('<a href="/x">extra reading</a>')
    ).otherwise(F.lit(""))
    related = F.concat(F.lit("related item "), (F.col(id_col) % 7).cast("string"))
    html = F.concat(
        F.lit("<html><head><title>"), src, F.lit(" #"), did,
        F.lit("</title><style>body{margin:0}</style><script>var d="), did,
        F.lit(";</script></head><body><header><h1>"), src,
        F.lit(' portal</h1><nav><a href="/">home</a> <a href="/archive">archive</a> <a href="/tags">tags</a>'),
        extra,
        F.lit("</nav></header><!-- build "), did, F.lit(" -->"),
        F.lit('<aside><ul><li><a href="/r/1">'), related,
        F.lit('</a></li><li><a href="/s/'), src, F.lit('">more from '), src,
        F.lit('</a></li></ul></aside><div class="ad">sponsored links</div>'),
        F.lit("<article><h2>document "), did, F.lit("</h2><p>"), p1,
        F.lit("</p><p>"), p2, F.lit("</p></article>"),
        F.lit('<div class="share"><a href="/share">share</a> <a href="/like">like</a></div>'),
        F.lit("<footer><p>copyright "), src,
        F.lit(' - <a href="/privacy">privacy</a> <a href="/contact">contact</a></p></footer>'),
        F.lit("</body></html>"),
    )
    return docs.select(F.col(id_col), html.alias("html"))
