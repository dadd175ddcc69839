from .corpus import corpus_rows, corpus_dataframe, SPANS_SCHEMA

__all__ = ["corpus_rows", "corpus_dataframe", "SPANS_SCHEMA"]
