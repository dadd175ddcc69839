"""Span-level operators: ordering, normalization, document text assembly.

All fully columnar (whole-stage codegen; no Python) except language
detection, which is an Arrow-batched pandas UDF.

Python-regex parity (SURVEY.md §7.3-1): the reference normalizes with Python
`re` (`strip`, `[\\x00-\\x1F\\x7F-\\x9F]`, `\\s+`). Spark regexps are Java.
We close the gap by spelling out the exact Python whitespace set as an
explicit character class instead of relying on Java's `\\s` (ASCII-only) or
`(?U)\\s` (misses \\x1C-\\x1F). Equivalence is asserted by
tests/test_parity_regex.py over every BMP codepoint.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Exactly the codepoints where Python str.isspace() is True (BMP):
# \t-\r, space, \x1c-\x1f, NEL \x85, NBSP \xa0, ogham  , en/em &c
#  - , LS  , PS  , NNBSP  , MMSP  ,
# ideographic 　.
PY_WS_CLASS = (
    "[\\t-\\r \\x1C-\\x1F\\x85\\xA0\\u1680\\u2000-\\u200A"
    "\\u2028\\u2029\\u202F\\u205F\\u3000]"
)
CONTROL_CLASS = "[\\x00-\\x1F\\x7F-\\x9F]"
CJK_LANGS = ("zh", "ja", "ko")


def py_strip(col: Column) -> Column:
    """str.strip() equivalent (Python whitespace set, not Java trim)."""
    return F.regexp_replace(col, f"^{PY_WS_CLASS}+|{PY_WS_CLASS}+$", "")


def preprocess_text(col: Column, lang: Column) -> Column:
    """preprocess_for_language (language_detector.py:67-85), columnar:
    falsy (null or '') passes through; strip; drop control chars; collapse
    whitespace runs to one space unless lang in zh/ja/ko."""
    cleaned = F.regexp_replace(py_strip(col), CONTROL_CLASS, "")
    collapsed = F.when(
        lang.isin(*CJK_LANGS), cleaned
    ).otherwise(F.regexp_replace(cleaned, f"{PY_WS_CLASS}+", " "))
    return F.when(col.isNull() | (col == ""), col).otherwise(collapsed)


def sorted_spans(spans: Column) -> Column:
    """Spans re-ordered by offset — the input stores them shuffled; the
    (kind, text, media_ref, order) invariant is rebuilt here, never taken
    from array/shuffle order (SURVEY.md §7.3-2)."""
    return F.array_sort(
        spans,
        lambda l, r: l["offset"].cast("int") - r["offset"].cast("int"),
    )


def text_sample(spans_sorted: Column, n: int = 3) -> Column:
    """First-n-text-spans sample used for language detection (the
    reference's 3-page sample, extractor.py:56-70)."""
    texts = F.transform(
        F.slice(F.filter(spans_sorted, lambda s: s["kind"] == "text"), 1, n),
        lambda s: F.coalesce(s["text"], F.lit("")),
    )
    return F.array_join(texts, "\n")


def detect_language_udf():
    """Arrow-batched language detection — same pure function as the oracle,
    so the normalization branch (CJK vs collapse) agrees by construction."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.StringType())
    def _detect(texts):
        from ..oracle.language import detect_language

        return texts.map(detect_language)

    return _detect


def language_name_col(lang: Column) -> Column:
    """Code -> name via a literal map (tiny dim; language_detector.py:47-65);
    unknown codes pass through."""
    from ..oracle.language import LANGUAGE_NAMES

    pairs = []
    for k, v in LANGUAGE_NAMES.items():
        pairs.extend([F.lit(k), F.lit(v)])
    return F.coalesce(F.create_map(*pairs)[lang], lang)


def normalize_documents(df: DataFrame, lang_col: str | None = None) -> DataFrame:
    """documents(doc_id, spans) -> + lang, spans (ordered & normalized with
    `order` field), all_text, meta.

    If lang_col is given, that column supplies the language (already-known
    language, e.g. bench over the driver `documents` table); otherwise the
    pandas-UDF detector runs on the 3-span sample.
    """
    out = df.withColumn("_spans_sorted", sorted_spans(F.col("spans")))

    if lang_col:
        out = out.withColumn("lang", F.col(lang_col))
    else:
        detect = detect_language_udf()
        out = out.withColumn("_sample", text_sample(F.col("_spans_sorted")))
        out = out.withColumn("lang", detect(F.col("_sample")))

    norm_struct = lambda s, i: F.struct(  # noqa: E731
        s["kind"].alias("kind"),
        F.when(s["kind"] == "text", preprocess_text(s["text"], F.col("lang")))
        .alias("text"),
        F.when(s["kind"] != "text", s["media_ref"]).alias("media_ref"),
        s["offset"].alias("offset"),
        i.cast("int").alias("order"),
    )
    out = out.withColumn(
        "spans", F.transform(F.col("_spans_sorted"), norm_struct)
    )
    all_text = F.array_join(
        F.transform(
            F.filter(F.col("spans"), lambda s: s["kind"] == "text"),
            lambda s: F.coalesce(s["text"], F.lit("")),
        ),
        "\n",
    )
    num_pages = F.size(F.filter(F.col("spans"), lambda s: s["kind"] == "text"))
    out = out.withColumn("all_text", all_text).withColumn(
        "meta",
        F.struct(
            F.col("lang").alias("language"),
            language_name_col(F.col("lang")).alias("language_name"),
            num_pages.cast("int").alias("num_pages"),
            F.lit("text").alias("extraction_method"),
        ),
    )
    return out.drop("_spans_sorted", "_sample", "lang")
