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
