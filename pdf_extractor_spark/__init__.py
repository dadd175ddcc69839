"""pdf_extractor_spark — a PySpark-native document extraction & analytics engine.

A from-scratch re-expression of the query/data-processing capabilities of the
reference desktop app (GHPXD/pdf-extractor, see SURVEY.md) as an idiomatic
Spark pipeline over a lakehouse table of interleaved text+media documents:

    documents(doc_id string,
              spans array<struct<kind string, text string,
                                 media_ref string, offset int>>)

Stages (all DataFrame expressions; Python only via Arrow-batched pandas UDFs):

    normalize spans  ->  classify by rules  ->  template field extraction
    ->  schema validation  ->  write extracted + metrics (per-bucket lineage)

plus the analytics query set (SURVEY.md §2.7) and large-scale training-data
operators (dedup, similarity search, text stats, multimodal plumbing).
"""

__version__ = "0.1.0"
