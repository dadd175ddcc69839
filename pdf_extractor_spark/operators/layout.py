"""Layout parsing: reading-order reconstruction over positioned text boxes.

North-rule component: "PDF/layout parse". The reference rebuilds a page's
text from extractor-emitted spans in positional order (reference
src/core/extractor.py:59-75 sorts spans and joins their text); real PDF
layout engines must first recover that order from box geometry. This
module implements the standard two-step heuristic (public knowledge — the
XY-cut family): split a page at the horizontal mid-gap into columns, then
read each column top-to-bottom, left-to-right.

Scale design: one window over (doc_id) — a single hash shuffle on the
document key, the same partitioning every other per-doc operator uses, so
at 10^12 docs this co-partitions with the rest of the pipeline and AQE
handles stragglers. Per-doc box counts are bounded (pages have dozens of
boxes, not millions), so no skew surface. Fully columnar; no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def reading_order(
    boxes: DataFrame,
    doc_col: str = "doc_id",
) -> DataFrame:
    """Assign each box a column index and a reading rank.

    boxes: (doc_id, box_id, x, y, w, h, ...). A box belongs to the right
    column when its center lies strictly right of the page midline
    (midline = (leftmost x + rightmost x+w) / 2 per document). Single-
    column pages degenerate gracefully: every center sits at or left of
    the midline only when boxes span the width — either way all boxes
    land in one column and the order is the plain top-to-bottom sort.

    Output adds: col_idx (0 = left / full-width, 1 = right) and rank
    (1-based reading order: columns left-to-right, then y, then x)."""
    w = Window.partitionBy(doc_col)
    midline = (
        F.min("x").over(w) + F.max(F.col("x") + F.col("w")).over(w)
    ) / 2.0
    center = F.col("x") + F.col("w") / 2.0
    out = boxes.withColumn(
        "col_idx", (center > midline).cast("int")
    )
    order = Window.partitionBy(doc_col).orderBy("col_idx", "y", "x")
    return out.withColumn("rank", F.row_number().over(order))


def assemble_text(ordered: DataFrame, doc_col: str = "doc_id") -> DataFrame:
    """Concatenate box text in reading order per document (the reference's
    span-join step). groupBy on the same doc key as reading_order, so the
    aggregation reuses the window's shuffle partitioning."""
    return (
        ordered.groupBy(doc_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("rank", "text"))
                    ),
                    lambda s: s["text"],
                ),
                " ",
            ).alias("page_text"),
            F.count("*").cast("long").alias("n_boxes"),
            F.max("col_idx").cast("int").alias("n_extra_cols"),
        )
    )


def extract_text_tables(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, table_idx, row_idx, col_idx, cell) — text-mode table
    extraction: contiguous runs of ' | '-delimited lines are parsed into
    a cell grid. This is the real (non-stubbed) counterpart of the
    table_producer kernel seam (reference extractor.py:97-143 parses
    lattice tables out of PDF pages; the text-layer analog is pipe/
    markdown tables): table boundaries are gaps-and-islands over the
    line number, rows are positions within an island, cells are a second
    split. row_idx 0 is the table's first line (the header by markdown
    convention); cells keep their trimmed text verbatim.

    Scale: posexplode of split lines is a narrow generator; both windows
    (island group + row rank) and nothing else share ONE hash shuffle on
    doc_id — HashPartitioning(doc_id) satisfies every finer clustering
    downstream. Non-table lines are filtered BEFORE the shuffle, so the
    exchange moves only table content, not the corpus.
    """
    lines = df.select(
        F.col(id_col),
        F.posexplode_outer(F.split(F.col(text_col), "\n")).alias(
            "line_no", "line"
        ),
    ).where(F.col("line").contains(" | "))
    w_doc = Window.partitionBy(id_col).orderBy("line_no")
    grp = (F.col("line_no") - F.row_number().over(w_doc)).alias("grp")
    grouped = lines.select(id_col, "line_no", "line", grp)
    w_grp = Window.partitionBy(id_col, "grp").orderBy("line_no")
    w_tbl = Window.partitionBy(id_col).orderBy("grp")
    rows = grouped.select(
        id_col,
        (F.dense_rank().over(w_tbl) - 1).cast("int").alias("table_idx"),
        (F.row_number().over(w_grp) - 1).cast("int").alias("row_idx"),
        F.col("line"),
    )
    return rows.select(
        id_col,
        "table_idx",
        "row_idx",
        F.posexplode(F.split(F.col("line"), r" \| ")).alias(
            "col_idx", "cell"
        ),
    ).select(
        id_col,
        "table_idx",
        "row_idx",
        F.col("col_idx").cast("int").alias("col_idx"),
        F.trim(F.col("cell")).alias("cell"),
    )


def synthesize_hyphen_wraps(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    every: int = 5,
    min_len: int = 4,
) -> DataFrame:
    """(doc_id, wrapped) — deterministic line-wrap hyphenation over the
    flat token corpus (the `synthesize_pages` pattern: the driver corpus
    has no line structure, so the dehyphenation input is synthesized
    columnar and the DuckDB oracle rebuilds the identical string). Token
    i (1-based) is broken at its midpoint into 'xx-\\nyy' when
    (doc_id + i) % every == 0 and the token has >= min_len chars — the
    shape a justified PDF text layer emits at the right margin."""
    toks = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), " "),
        lambda t: t != "",
    )

    def _wrap(t, i):
        half = F.floor(F.length(t) / 2).cast("int")
        return (
            F.when(
                ((F.col(id_col) + i + F.lit(1)) % every == 0)
                & (F.length(t) >= min_len),
                F.concat(
                    t.substr(F.lit(1), half),
                    F.lit("-\n"),
                    t.substr(half + 1, F.length(t)),
                ),
            ).otherwise(t)
        )

    wrapped = F.array_join(F.transform(toks, _wrap), " ")
    return df.select(F.col(id_col), wrapped.alias("wrapped"))


def dehyphenate(
    df: DataFrame,
    text_col: str = "wrapped",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_wraps, dehyphenated) — repair end-of-line hyphenation:
    every '-\\n' break is joined back into one token (the standard PDF
    text-layer cleanup step; the reference's extractor emits the raw text
    layer, reference src/core/extractor.py:59-75, and wrapped tokens are
    what a justified layout leaves in it). Deliberately joins ALL wraps —
    distinguishing soft wraps from true compound hyphens needs a lexicon
    and is out of scope (documented limitation, as in every rule-based
    dehyphenator).

    Scale: a narrow codegen projection (regexp + length arithmetic), no
    shuffle, filter-at-scan-speed — the same shape as nfc_normalize."""
    src = F.coalesce(F.col(text_col), F.lit(""))
    repaired = F.regexp_replace(src, "-\n", "")
    return df.select(
        F.col(id_col),
        ((F.length(src) - F.length(repaired)) / 2)
        .cast("long")
        .alias("n_wraps"),
        repaired.alias("dehyphenated"),
    )


def synthesize_doc_pages(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_pages: int = 4,
) -> DataFrame:
    """(doc_id, n_pages, page_no, page) — deterministic multi-page layout
    per document: 1 + doc_id % max_pages pages, tokens split into equal
    runs, every page decorated with the repeating header 'Report doc N'
    and the page-numbered footer 'Page p of n' — the boilerplate shape
    header_footer_strip exists to remove. Pure split/slice/concat so the
    DuckDB oracle rebuilds identical pages."""
    toks = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), " "),
        lambda t: t != "",
    )
    n_pages = (F.lit(1) + F.col(id_col) % max_pages).cast("int")
    out = (
        df.select(F.col(id_col), toks.alias("_toks"), n_pages.alias("n_pages"))
        .withColumn(
            "per_page",
            F.greatest(
                F.lit(1),
                F.ceil(F.size("_toks") / F.col("n_pages")).cast("int"),
            ),
        )
        .select(
            id_col,
            "n_pages",
            "_toks",
            "per_page",
            F.explode(F.sequence(F.lit(1), F.col("n_pages"))).alias(
                "page_no"
            ),
        )
    )
    body = F.array_join(
        F.slice(
            F.col("_toks"),
            (F.col("page_no") - 1) * F.col("per_page") + 1,
            F.col("per_page"),
        ),
        " ",
    )
    page = F.concat(
        F.lit("Report doc "),
        F.col(id_col).cast("string"),
        F.lit("\n"),
        body,
        F.lit("\nPage "),
        F.col("page_no").cast("string"),
        F.lit(" of "),
        F.col("n_pages").cast("string"),
    )
    return out.select(
        id_col, "n_pages", F.col("page_no").cast("int"), page.alias("page")
    )


def header_footer_strip(
    pages: DataFrame,
    id_col: str = "doc_id",
    page_col: str = "page_no",
    text_col: str = "page",
    min_frac: float = 0.8,
) -> DataFrame:
    """(doc_id, n_pages, n_lines, n_boiler_lines, body_md5) — detect and
    strip running headers/footers: a line is boilerplate when its
    digit-normalized form ('Page 3 of 9' -> 'Page # of #') appears on at
    least max(2, ceil(min_frac * n_pages)) DISTINCT pages of the same
    document. This is the frequency heuristic every PDF main-content
    extractor uses (headers repeat, body text doesn't); the floor of 2
    means single-page documents are never stripped — one page cannot
    witness repetition. body_md5 fingerprints the surviving lines joined
    in (page_no, line_no) order, so the oracle check covers the exact
    reconstructed body, not just counts.

    Scale: every shuffle — the line-frequency groupBy, the two joins,
    and the final rollup — keys on doc_id (the frequency key (doc_id,
    norm) is a refinement), so one HashPartitioning(doc_id) serves the
    whole plan, co-partitioned with the rest of the per-doc pipeline.
    Per-doc page×line counts are bounded (documents, not logs), so the
    collect_list rollup holds no more than one document's lines."""
    lines = pages.select(
        F.col(id_col),
        F.col(page_col),
        F.posexplode(F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")).alias(
            "line_no", "line"
        ),
    ).withColumn("norm", F.regexp_replace("line", "[0-9]+", "#"))
    freq = lines.groupBy(id_col, "norm").agg(
        F.countDistinct(page_col).alias("_n_with")
    )
    npages = pages.groupBy(id_col).agg(
        F.countDistinct(page_col).cast("int").alias("n_pages")
    )
    flagged = (
        lines.join(freq, [id_col, "norm"])
        .join(npages, id_col)
        .withColumn(
            "_boiler",
            F.col("_n_with")
            >= F.greatest(
                F.lit(2), F.ceil(F.lit(min_frac) * F.col("n_pages"))
            ),
        )
    )
    kept_struct = F.when(
        ~F.col("_boiler"),
        F.struct(F.col(page_col), F.col("line_no"), F.col("line")),
    )
    return flagged.groupBy(id_col).agg(
        F.max("n_pages").alias("n_pages"),
        F.count("*").cast("long").alias("n_lines"),
        F.sum(F.col("_boiler").cast("long")).alias("n_boiler_lines"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.filter(
                            F.collect_list(kept_struct),
                            lambda s: s.isNotNull(),
                        )
                    ),
                    lambda s: s["line"],
                ),
                "\n",
            )
        ).alias("body_md5"),
    )


def synthesize_sections(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_sections: int = 3,
    line_tokens: int = 6,
) -> DataFrame:
    """(doc_id, doc) — deterministic sectioned document: 1 + doc_id %
    max_sections sections, each an ALL-CAPS heading line ('HEADING s 1')
    followed by the section's tokens wrapped into `line_tokens`-word
    lines. Docs where doc_id % 7 == 0 additionally get an unheaded
    preamble line first (the section-0 case a segmenter must handle).
    Pure split/slice/concat, so the DuckDB oracle rebuilds the identical
    string."""
    toks = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), " "),
        lambda t: t != "",
    )
    n_sec = (F.lit(1) + F.col(id_col) % max_sections).cast("int")
    base = df.select(
        F.col(id_col), toks.alias("_toks"), n_sec.alias("_nsec")
    ).withColumn(
        "_per",
        F.greatest(
            F.lit(1), F.ceil(F.size("_toks") / F.col("_nsec")).cast("int")
        ),
    )

    def _section(s):
        sec_toks = F.slice(
            F.col("_toks"), ((s - 1) * F.col("_per") + 1).cast("int"), F.col("_per")
        )
        n_lines = F.ceil(F.size(sec_toks) / F.lit(line_tokens)).cast("int")
        body_lines = F.when(
            n_lines > 0,
            F.transform(
                F.sequence(F.lit(1), n_lines),
                lambda i: F.array_join(
                    F.slice(
                        sec_toks, ((i - 1) * line_tokens + 1).cast("int"),
                        line_tokens,
                    ),
                    " ",
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        heading = F.concat(
            F.lit("HEADING "), s.cast("string"), F.lit(" 1")
        )
        return F.concat_ws(
            "\n", F.array(heading), F.array_join(body_lines, "\n")
        )

    sections = F.array_join(
        F.transform(F.sequence(F.lit(1), F.col("_nsec")), _section), "\n"
    )
    doc = F.when(
        F.col(id_col) % 7 == 0,
        F.concat(F.lit("unheaded preamble text\n"), sections),
    ).otherwise(sections)
    return base.select(F.col(id_col), doc.alias("doc"))


def section_split(
    df: DataFrame,
    text_col: str = "doc",
    id_col: str = "doc_id",
    max_heading_words: int = 4,
) -> DataFrame:
    """(doc_id, section_idx, heading, n_lines, n_tokens) — heading-based
    document segmentation: a line is a HEADING when it is non-empty,
    contains no lowercase letters, and has at most `max_heading_words`
    whitespace words (the classic layout heuristic — short ALL-CAPS lines
    start sections). Each heading opens a new section holding the lines
    up to the next heading; lines before the first heading form the
    unheaded section 0 (heading = NULL). n_lines/n_tokens count body
    lines only, never the heading itself.

    Scale: posexplode lines, one running-sum window over (doc_id) to
    number sections (the same gaps-and-islands shape as
    extract_text_tables — one hash shuffle on the doc key), then a
    groupBy on (doc_id, section_idx) that reuses that partitioning.
    """
    lines = df.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
        ).alias("line_no", "line"),
    )
    is_heading = (
        (F.col("line") != "")
        & ~F.col("line").rlike("[a-z]")
        & (F.size(F.split(F.col("line"), r"\s+")) <= max_heading_words)
    )
    w = (
        Window.partitionBy(id_col)
        .orderBy("line_no")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = lines.withColumn("_h", is_heading).withColumn(
        "section_idx", F.sum(F.col("_h").cast("int")).over(w).cast("int")
    )
    n_tok = F.when(
        F.col("line") == "", F.lit(0)
    ).otherwise(F.size(F.split(F.col("line"), r"\s+")))
    return marked.groupBy(id_col, "section_idx").agg(
        F.max(F.when(F.col("_h"), F.col("line"))).alias("heading"),
        F.sum((~F.col("_h")).cast("long")).alias("n_lines"),
        F.sum(F.when(~F.col("_h"), n_tok).otherwise(0))
        .cast("long")
        .alias("n_tokens"),
    )


def synthesize_quotes(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    period: int = 19,
    quote_tokens: int = 3,
) -> DataFrame:
    """(doc_id, qtext) — deterministic quoted corpus: every `period`-th
    token opens a quotation spanning `quote_tokens` tokens ('"' glued to
    the opening token's front and the closing token's back). A document
    whose tail cuts a quotation short leaves an UNCLOSED quote — the
    degenerate case an extractor must not match. Pure transform/concat
    so the DuckDB oracle rebuilds the identical string."""
    toks = F.filter(
        F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
        lambda t: t != "",
    )
    qtext = F.array_join(
        F.zip_with(
            toks,
            F.sequence(F.lit(0), F.size(toks) - 1),
            lambda t, i: F.concat(
                F.when(i % period == 0, F.lit('"')).otherwise(F.lit("")),
                t,
                F.when(
                    i % period == quote_tokens - 1, F.lit('"')
                ).otherwise(F.lit("")),
            ),
        ),
        " ",
    )
    return df.select(F.col(id_col), qtext.alias("qtext"))


def quote_extract(
    df: DataFrame,
    text_col: str = "qtext",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_quotes, quoted_tokens, max_quote_tokens) — quotation
    extraction: the spans between balanced double-quote pairs, the
    attribution/citation primitive of news-corpus curation. Unclosed
    trailing quotes never match (regex requires the closing '"').

    Scale: one regexp_extract_all + array folds per row — no explode,
    no join, no shuffle; the aggregate shape every per-doc textstat
    uses. Empty-text docs emit (0, 0, 0) rather than vanishing.
    """
    quotes = F.expr(
        f"regexp_extract_all({text_col}, '\"([^\"]*)\"', 1)"
    )
    qtoks = F.transform(
        quotes,
        lambda q: F.when(F.trim(q) == "", F.lit(0)).otherwise(
            F.size(F.split(F.trim(q), r"\s+"))
        ),
    )
    return df.select(
        F.col(id_col),
        F.size(quotes).cast("long").alias("n_quotes"),
        F.coalesce(
            F.aggregate(qtoks, F.lit(0), lambda acc, x: acc + x), F.lit(0)
        )
        .cast("long")
        .alias("quoted_tokens"),
        F.coalesce(F.array_max(qtoks), F.lit(0))
        .cast("long")
        .alias("max_quote_tokens"),
    )


def synthesize_toc(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, ttext) — deterministic dotted-number outlines: 1 +
    doc_id % 4 heading lines; heading i (0-based) has depth 1 + i % 3,
    numbered by joining ((doc_id + i + j) % 9 + 1) for j < depth with
    '.', then ' Title <i>'. A plain body line follows each heading (and
    one precedes everything) so the extractor must select, not assume."""
    n_h = (1 + F.col(id_col) % 4).cast("int")
    lines = F.transform(
        F.sequence(F.lit(0), n_h - 1),
        lambda i: F.concat(
            F.array_join(
                F.transform(
                    F.sequence(F.lit(0), (i % 3).cast("int")),
                    lambda j: ((F.col(id_col) + i + j) % 9 + 1).cast(
                        "string"
                    ),
                ),
                ".",
            ),
            F.lit(" Title "),
            i.cast("string"),
            F.lit("\nplain body text here"),
        ),
    )
    ttext = F.concat(
        F.lit("intro line\n"), F.array_join(lines, "\n")
    )
    return df.select(F.col(id_col), ttext.alias("ttext"))


def toc_extract(
    df: DataFrame,
    text_col: str = "ttext",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_entries, max_depth, n_top_level) — table-of-contents
    extraction: lines opening with a dotted section number ('2.3.4
    Title ...') are outline entries; depth = dot count + 1. The
    document-outline recovery step of PDF/report parsing.

    Scale: explode lines, regexp per line, per-doc aggregate — one
    shuffle on the doc key.
    """
    lines = df.select(
        F.col(id_col),
        F.explode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
        ).alias("line"),
    )
    num = F.regexp_extract(F.col("line"), r"^([0-9]+(\.[0-9]+)*) ", 1)
    entries = lines.where(num != "").select(
        F.col(id_col),
        (F.size(F.split(num, r"\.")) ).cast("long").alias("depth"),
    )
    return entries.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_entries"),
        F.max("depth").alias("max_depth"),
        F.sum((F.col("depth") == 1).cast("long")).alias("n_top_level"),
    )


def synthesize_footnotes(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, ftext) — body with [n] footnote markers plus trailing
    definition lines: markers 1 .. 1 + doc_id % 3 appear in the body;
    the DEFINITION for marker n is omitted when (doc_id + n) % 4 == 0
    (dangling marker), and an extra definition [9] nobody references is
    appended when doc_id % 5 == 0 (orphan definition)."""
    m = (1 + F.col(id_col) % 3).cast("int")
    markers = F.array_join(
        F.transform(
            F.sequence(F.lit(1), m),
            lambda n: F.concat(
                F.lit("claim"), n.cast("string"), F.lit("["),
                n.cast("string"), F.lit("]"),
            ),
        ),
        " ",
    )
    defs = F.array_join(
        F.filter(
            F.transform(
                F.sequence(F.lit(1), m),
                lambda n: F.when(
                    (F.col(id_col) + n) % 4 != 0,
                    F.concat(
                        F.lit("["), n.cast("string"),
                        F.lit("] source note"),
                    ),
                ),
            ),
            lambda x: x.isNotNull(),
        ),
        "\n",
    )
    extra = F.when(
        F.col(id_col) % 5 == 0, F.lit("\n[9] orphan note")
    ).otherwise(F.lit(""))
    ftext = F.concat(
        F.lit("body "), markers, F.lit("\n"), defs, extra
    )
    return df.select(F.col(id_col), ftext.alias("ftext"))


def footnote_link(
    df: DataFrame,
    text_col: str = "ftext",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_markers, n_resolved, n_dangling, n_orphan_defs) —
    footnote linking: [n] markers NOT at line start are references,
    lines opening with '[n] ' are definitions; resolved = marker with a
    definition, dangling = marker without, orphan = definition nobody
    references. Set algebra via array_intersect/array_except — no
    explode, no join, no shuffle.
    """
    txt = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.split(txt, "\n")
    defs = F.array_distinct(
        F.filter(
            F.transform(
                lines,
                lambda l: F.regexp_extract(l, r"^\[([0-9]+)\] ", 1),
            ),
            lambda x: x != "",
        )
    )
    body_lines = F.filter(
        lines, lambda l: ~l.rlike(r"^\[[0-9]+\] ")
    )
    markers = F.array_distinct(
        F.flatten(
            F.transform(
                body_lines,
                lambda l: F.regexp_extract_all(
                    l, F.lit(r"\[([0-9]+)\]"), F.lit(1)
                ),
            )
        )
    )
    resolved = F.array_intersect(markers, defs)
    dangling = F.array_except(markers, defs)
    orphans = F.array_except(defs, markers)
    return df.select(
        F.col(id_col),
        F.size(markers).cast("long").alias("n_markers"),
        F.size(resolved).cast("long").alias("n_resolved"),
        F.size(dangling).cast("long").alias("n_dangling"),
        F.size(orphans).cast("long").alias("n_orphan_defs"),
    )


def synthesize_lists(
    df: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, ltext) — deterministic bulleted documents: a body line,
    then a bullet block of doc_id % 4 items ('- item <i>'), another body
    line, and a second block of doc_id % 3 items ('* alt <i>'); zero-item
    blocks simply vanish, giving docs with 0, 1, or 2 lists."""
    def _block(n, fmt):
        # sequence(1, 0) is DESCENDING in Spark, not empty — guard
        return F.when(
            n >= 1,
            F.transform(
                F.sequence(F.lit(1), n),
                lambda i: F.concat(F.lit(fmt), i.cast("string")),
            ),
        ).otherwise(F.array().cast("array<string>"))

    b1 = _block((F.col(id_col) % 4).cast("int"), "- item ")
    b2 = _block((F.col(id_col) % 3).cast("int"), "* alt ")
    parts = F.concat(
        F.array(F.lit("prose opens the page")),
        b1,
        F.array(F.lit("prose between blocks")),
        b2,
    )
    return df.select(
        F.col(id_col), F.array_join(parts, "\n").alias("ltext")
    )


def list_detect(
    df: DataFrame,
    text_col: str = "ltext",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_lists, n_items, max_list_len) — bulleted-list block
    detection: lines opening with '- ' or '* ' are items, maximal runs
    of consecutive item lines form a LIST block. The list-structure
    recovery step of layout parsing (lists carry different training
    value than prose — they're enumerations, not sentences). Docs with
    no items report (0, 0, 0).

    Scale: the familiar gaps-and-islands shape — posexplode lines, one
    running-sum window keyed by doc_id, two groupBys that reuse the
    partitioning. One shuffle.
    """
    lines = df.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
        ).alias("line_no", "line"),
    )
    is_item = F.col("line").rlike(r"^[-*] ")
    w = (
        Window.partitionBy(id_col)
        .orderBy("line_no")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = lines.withColumn("_i", is_item).withColumn(
        "block_id", F.sum((~F.col("_i")).cast("int")).over(w)
    )
    blocks = (
        marked.where(F.col("_i"))
        .groupBy(id_col, "block_id")
        .agg(F.count("*").alias("blen"))
    )
    agg = blocks.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_lists"),
        F.sum("blen").cast("long").alias("n_items"),
        F.max("blen").cast("long").alias("max_list_len"),
    )
    return (
        df.select(id_col)
        .join(agg, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_lists", F.lit(0)).cast("long").alias("n_lists"),
            F.coalesce("n_items", F.lit(0)).cast("long").alias("n_items"),
            F.coalesce("max_list_len", F.lit(0))
            .cast("long")
            .alias("max_list_len"),
        )
    )


def table_column_types(tables: DataFrame) -> DataFrame:
    """(doc_id, table_idx, col_idx, header, n_rows, dtype) — column-type
    inference over extracted table grids (the table-understanding step
    after extract_text_tables): row 0 is the header, data cells vote
    'int' when every cell is an optionally-signed integer, 'num' when
    every cell parses as a number but not all as integers, else 'text'.
    Empty columns (header-only tables) type as 'text'.

    Scale: one aggregate keyed by (doc, table, col) — co-partitioned
    with the extractor's doc-key shuffle.
    """
    is_int = F.col("cell").rlike(r"^-?[0-9]+$")
    is_num = F.col("cell").rlike(r"^-?[0-9]+(\.[0-9]+)?$")
    agg = tables.groupBy("doc_id", "table_idx", "col_idx").agg(
        F.max(F.when(F.col("row_idx") == 0, F.col("cell"))).alias(
            "header"
        ),
        F.sum((F.col("row_idx") > 0).cast("long")).alias("n_rows"),
        F.sum(
            ((F.col("row_idx") > 0) & is_int).cast("long")
        ).alias("_n_int"),
        F.sum(
            ((F.col("row_idx") > 0) & is_num).cast("long")
        ).alias("_n_num"),
    )
    dtype = (
        F.when(
            (F.col("n_rows") > 0) & (F.col("_n_int") == F.col("n_rows")),
            F.lit("int"),
        )
        .when(
            (F.col("n_rows") > 0) & (F.col("_n_num") == F.col("n_rows")),
            F.lit("num"),
        )
        .otherwise(F.lit("text"))
    )
    return agg.select(
        "doc_id",
        "table_idx",
        "col_idx",
        "header",
        F.col("n_rows").cast("long"),
        dtype.alias("dtype"),
    )
