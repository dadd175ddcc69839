"""Reference-parity oracle.

A tiny pure-Python transcription of the reference's observable semantics
(SURVEY.md §5.3-1): language preprocessing, rule classification + fusion,
field/record validation, template field extraction, and the per-document
extraction pipeline. Tests assert Spark output == oracle output row by row
(span-sequence equality on (kind, text, media_ref, order), BASELINE.json).

The invariant-bearing regex paths (classification scoring, template field
extraction) are ALSO executed through these functions inside Arrow-batched
pandas UDFs on executors, so Python-`re` semantics hold by construction
(SURVEY.md §4.3 "Python-regex parity").
"""

from .language import detect_language, get_language_name, preprocess_for_language
from .classifier import classify_by_rules, fuse_classification
from .validator import validate_field, validate_data
from .template import extract_template_fields
from .extract import extract_document

__all__ = [
    "detect_language",
    "get_language_name",
    "preprocess_for_language",
    "classify_by_rules",
    "fuse_classification",
    "validate_field",
    "validate_data",
    "extract_template_fields",
    "extract_document",
]
