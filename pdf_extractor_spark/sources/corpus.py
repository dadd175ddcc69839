"""Deterministic synthetic corpus of interleaved text+media documents.

Generates the input table from FIXTURES.md §1 / BASELINE.json input_hint:

    doc_id string,
    spans  array<struct<kind string, text string, media_ref string, offset int>>

Rules (FIXTURES.md):
  * kinds interleaved (text-heavy, image/table sprinkled); >=1 text span per
    doc; offset = original span index (contiguous from 0).
  * spans stored SHUFFLED within the array by a seeded permutation — the
    pipeline must re-sort by offset; order is never free.
  * ~60% of docs carry invoice-like text (classification positive class),
    ~40% neutral; a receipt class sprinkled in.
  * skew tail: 1 in 1000 docs gets 2,000-10,000 spans.
  * fully seed-fixed (per-doc RNG), wall-clock-free, and ORDER-INDEPENDENT:
    doc i's content depends only on (seed, i), so generation parallelizes
    over doc ranges with identical results.

Fixture strings (verbatim, with reference-test provenance — FIXTURES.md §1
table) are embedded so the span-equality pytest exercises the exact cases the
reference's own unit tests assert on.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SEED = 42

SPANS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField(
            "spans",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("kind", T.StringType(), False),
                        T.StructField("text", T.StringType(), True),
                        T.StructField("media_ref", T.StringType(), True),
                        T.StructField("offset", T.IntegerType(), False),
                    ]
                )
            ),
            False,
        ),
    ]
)

# --- fixture texts (FIXTURES.md §1; provenance in comments) ---------------
T1_INVOICE = "DANFE\nNF-e nº 123456\nCNPJ: 12.345.678/0001-90"  # test_document_classifier.py:60-64
T2_NEUTRAL = "Este é um texto aleatório que não contém padrões específicos."  # :67-71
T3_SPACES = "  This   is  a   text   with   extra   spaces.  "  # test_language_detector.py:37-39
T4_CJK = "这是  中文  文本"  # :42-44
T5_CONTROL = "Text with \x00 control \x1f characters"  # :50-52
T6_SHORT = "Hi"  # :22-23
T7_EMPTY = ""  # extractor.py:76 `or ""`
T8_INVOICE_FIELDS = (
    "NF-e nº 42\n"
    "DATA DE EMISSÃO: 15/03/2024\n"
    "VALOR TOTAL DA NOTA: 1.234,56\n"
    "IMPOSTOS: 1.000,00\n"
    "DESCONTO: 200,00\n"
    "FRETE: 34,56\n"
    "EMITENTE: ACME Ltda\n"
    "CNPJ: 12.345.678/0001-95\n"
    "CPF: 123.456.789-09\n"
    "EMAIL: contato@acme.com.br\n"
    "Chave de Acesso: 12345678901234567890123456789012345678901234"
)  # extractor.py:252-272 + schemas/invoice_schema.json fixtures
T9_NBSP = "non breaking  space   text here okay"  # unicode-ws parity probe
T10_RECEIPT = (
    "RECIBO DE PAGAMENTO\nRecebemos de Fulano\nValor Recebido: R$ 150,00\nAssinatura"
)

_FIXTURES = [T1_INVOICE, T2_NEUTRAL, T3_SPACES, T4_CJK, T5_CONTROL,
             T6_SHORT, T7_EMPTY, T8_INVOICE_FIELDS, T9_NBSP, T10_RECEIPT]

_NEUTRAL_WORDS = (
    "the report covers quarterly results and the data shows that growth is "
    "steady for this segment with a focus on the market and the outlook"
).split()
_PT_WORDS = (
    "o relatório de resultados não contém um resumo para a análise que se "
    "faz com os dados do período em uma visão por tema"
).split()

_INVOICE_BODIES = [T1_INVOICE, T8_INVOICE_FIELDS,
                   "DANFE\nDATA DE EMISSÃO\nVALOR TOTAL DA NOTA\nEmitente: X"]


def _neutral_sentence(rng: random.Random) -> str:
    words = rng.choices(_PT_WORDS if rng.random() < 0.4 else _NEUTRAL_WORDS,
                        k=rng.randint(6, 18))
    # sprinkle messy whitespace / control chars so normalization has work
    sep = rng.choice([" ", "  ", "   ", "\t", "\n"])
    txt = sep.join(words)
    if rng.random() < 0.1:
        txt = " " + txt + "  "
    if rng.random() < 0.05:
        txt = txt.replace(" ", " \x1f ", 1)
    return txt


def doc_row(i: int, seed: int = SEED) -> tuple[str, list[dict]]:
    """Deterministic document #i — pure function of (seed, i)."""
    rng = random.Random((seed << 20) ^ i)
    doc_id = f"doc-{i:012d}"

    if i % 1000 == 999:  # skew tail
        n_spans = rng.randint(2000, 10000)
    else:
        n_spans = rng.randint(3, 12)

    r = rng.random()
    if r < 0.55:
        body_pool, klass = _INVOICE_BODIES, "invoice"
    elif r < 0.62:
        body_pool, klass = [T10_RECEIPT], "receipt"
    else:
        body_pool, klass = [T2_NEUTRAL], "neutral"

    spans: list[dict] = []
    if klass != "neutral":
        # one span per body LINE — models the reference's per-page text
        # units (preprocessing strips \n inside a page, so multi-line
        # content must arrive as separate spans to stay matchable)
        for line in rng.choice(body_pool).split("\n"):
            spans.append(
                {"kind": "text", "text": line, "media_ref": None,
                 "offset": len(spans)}
            )
    while len(spans) < n_spans:
        off = len(spans)
        roll = rng.random()
        if off > 0 and roll < 0.12:
            kind = "image" if rng.random() < 0.6 else "table"
            spans.append(
                {"kind": kind, "text": None,
                 "media_ref": f"media://{doc_id}/{off}", "offset": off}
            )
            continue
        if roll < 0.30:
            text = rng.choice(_FIXTURES)
        else:
            text = _neutral_sentence(rng)
        spans.append(
            {"kind": "text", "text": text, "media_ref": None, "offset": off}
        )

    rng.shuffle(spans)  # stored shuffled — order must be rebuilt from offset
    return doc_id, spans


def corpus_rows(n_docs: int, seed: int = SEED, start: int = 0):
    for i in range(start, start + n_docs):
        yield doc_row(i, seed)


def corpus_dataframe(
    spark: SparkSession, n_docs: int, seed: int = SEED, partitions: int | None = None
) -> DataFrame:
    """Distributed generation: parallelize doc indices, generate per-partition
    (no driver-side materialization of span arrays — scales to any n_docs)."""
    partitions = partitions or spark.sparkContext.defaultParallelism

    def gen(indices):
        for i in indices:
            did, spans = doc_row(i, seed)
            yield (did, [(s["kind"], s["text"], s["media_ref"], s["offset"])
                         for s in spans])

    rdd = spark.sparkContext.parallelize(range(n_docs), partitions).mapPartitions(gen)
    return spark.createDataFrame(rdd, SPANS_SCHEMA)


def write_corpus(spark: SparkSession, path: str, n_docs: int,
                 seed: int = SEED, partitions: int | None = None) -> None:
    corpus_dataframe(spark, n_docs, seed, partitions).write.mode(
        "overwrite"
    ).parquet(path)


def corpus_from_documents_table(docs: DataFrame) -> DataFrame:
    """Derive a spans-shaped corpus from the driver's flat `documents` table
    (doc_id, text, lang, ...) — used by bench so input volume scales with sf.

    Splits each document's text into sentence-ish chunks -> text spans, and
    inserts an image span every 5th position. Pure column ops; deterministic."""
    chunk = F.split(F.col("text"), r"(?<=\.)\s+|(?=\sthe\s)")
    spans = F.transform(
        chunk,
        lambda t, i: F.struct(
            F.when(i % 5 == 4, F.lit("image")).otherwise(F.lit("text")).alias("kind"),
            F.when(i % 5 != 4, t).alias("text"),
            F.when(
                i % 5 == 4,
                F.concat(F.lit("media://"), F.col("doc_id").cast("string"),
                         F.lit("/"), i.cast("string")),
            ).alias("media_ref"),
            i.cast("int").alias("offset"),
        ),
    )
    # reverse the array so order is not free (pipeline must sort by offset)
    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.reverse(spans).alias("spans"),
    )
