"""Property-based (hypothesis) parity fuzzing: columnar Spark semantics vs
the pure-Python oracle on adversarial generated inputs.

Batched for Spark economy: each hypothesis example is a LIST of strings
evaluated in one DataFrame job, so a run costs ~10 jobs, not ~200.
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

# mixed-script text: latin words, CJK, cyrillic, digits, whitespace zoo,
# control chars — everything the detection cascade and normalizer branch on
_scripts = st.one_of(
    st.text(alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E)),
    st.text(alphabet=st.characters(min_codepoint=0x4E00, max_codepoint=0x4E80)),
    st.text(alphabet=st.characters(min_codepoint=0x3040, max_codepoint=0x30FF)),
    st.text(alphabet=st.characters(min_codepoint=0x0400, max_codepoint=0x045F)),
    st.text(alphabet="  \t\n\x1c\x1d\x85\xa0的的是 the and of à é"),
    st.text(max_size=40),
)
_texts = st.lists(
    st.one_of(st.none(), _scripts), min_size=8, max_size=24
)

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    derandomize=True,  # seeded: same corpus every CI run
)


@given(texts=_texts)
@settings(**_SETTINGS)
def test_language_detection_parity(spark, texts):
    from pdf_extractor_spark.operators.spans import add_detected_language
    from pdf_extractor_spark.oracle.language import detect_language

    df = spark.createDataFrame(
        [(str(i), t) for i, t in enumerate(texts)], "id string, sample string"
    )
    got = {
        r.id: r.lang
        for r in add_detected_language(df, "sample", "lang").collect()
    }
    want = {str(i): detect_language(t) for i, t in enumerate(texts)}
    assert got == want


_values = st.lists(
    st.one_of(
        st.none(),
        st.text(max_size=20),
        st.from_regex(r"[0-9]{1,5}([.,][0-9]{1,4})?", fullmatch=True),
        st.from_regex(r"[0-9]{1,2}[/-][0-9]{1,2}[/-][0-9]{2,4}", fullmatch=True),
        st.sampled_from(
            ["true", "Sim", "não", "0", "1", "verdadeiro", "FALSO", "maybe"]
        ),
        st.from_regex(r"[a-z]{1,8}@[a-z]{1,8}\.[a-z]{2,3}", fullmatch=True),
    ),
    min_size=8,
    max_size=24,
)


@given(values=_values)
@settings(**_SETTINGS)
def test_field_validator_parity(spark, values):
    """Columnar field_error_col vs oracle validate_field for the
    coercion-from-string types (number/integer/date/boolean/email)."""
    from pdf_extractor_spark.config import FieldSchema
    from pdf_extractor_spark.operators.validate import field_error_col
    from pdf_extractor_spark.oracle.validator import validate_field

    types = ["number", "integer", "date", "boolean", "email"]
    schemas = {t: FieldSchema(type=t) for t in types}

    df = spark.createDataFrame(
        [(str(i), v) for i, v in enumerate(values)], "id string, v string"
    )
    out = df.select(
        "id",
        *[
            field_error_col(F.col("v"), schemas[t]).alias(f"e_{t}")
            for t in types
        ],
    )
    got = {r.id: {t: r[f"e_{t}"] for t in types} for r in out.collect()}
    for i, v in enumerate(values):
        for t in types:
            ok, err = validate_field(v, t, {})
            want = None if ok else err
            assert got[str(i)][t] == want, (v, t, got[str(i)][t], want)
