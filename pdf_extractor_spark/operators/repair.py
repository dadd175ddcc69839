"""Auto-repair operators (reference gui/validation_panel.py:530-625
``try_fix_value``, SURVEY.md §2.5) — heuristic fixes for failed validations,
fully columnar (when/otherwise + regexp chains; no Python).

Reference semantics ported:
  * required-empty ("obrigatório" in the error): default by field name —
    date-ish -> today's date dd/MM/yyyy, money-ish -> 0.0, quantity -> 1,
    name-ish -> "N/A", else unfixable (null).
  * CPF: strip non-digits; exactly 11 -> XXX.XXX.XXX-XX.
  * CNPJ: strip non-digits; exactly 14 -> XX.XXX.XXX/XXXX-XX.
  * email: value without '@' -> lowercased, spaces removed, + "@example.com".
  * date: >=3 digit groups -> dd/MM/yyyy with zero-padding, 2-digit year ->
    "20" + year.
  * number: ','->'.' then cast double, else 0.0; integer likewise, else 0.
  * boolean: truthy/falsy word sets (validator.py:125-138), else false.

The routing key is the reference's own dispatch: substring matches on the
error message and field name.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_DATE_FIELDS = ("data", "date")
_MONEY_FIELDS = ("valor", "total", "price", "amount")
_QTY_FIELDS = ("quantidade", "quantity")
_NAME_FIELDS = ("nome", "name", "description")

_TRUTHY = ("true", "yes", "sim", "1", "verdadeiro")
_FALSY = ("false", "no", "não", "0", "falso")


def fix_required_default(field: Column, today: Column | None = None) -> Column:
    """Default for a required-but-empty field, routed by field name
    (validation_panel.py:533-543). `today` defaults to current_date
    (reference uses datetime.now); pass a literal for deterministic runs."""
    today_str = F.date_format(
        today if today is not None else F.current_date(), "dd/MM/yyyy"
    )
    low = F.lower(field)
    return (
        F.when(low.isin(*_DATE_FIELDS), today_str)
        .when(low.isin(*_MONEY_FIELDS), F.lit("0.0"))
        .when(low.isin(*_QTY_FIELDS), F.lit("1"))
        .when(low.isin(*_NAME_FIELDS), F.lit("N/A"))
        .otherwise(F.lit(None).cast("string"))
    )


def fix_cpf(value: Column) -> Column:
    """11 digits -> XXX.XXX.XXX-XX else null (validation_panel.py:546-553)."""
    d = F.regexp_replace(value, r"[^0-9]", "")
    return F.when(
        F.length(d) == 11,
        F.concat_ws(
            "",
            F.substring(d, 1, 3), F.lit("."),
            F.substring(d, 4, 3), F.lit("."),
            F.substring(d, 7, 3), F.lit("-"),
            F.substring(d, 10, 2),
        ),
    )


def fix_cnpj(value: Column) -> Column:
    """14 digits -> XX.XXX.XXX/XXXX-XX else null (:555-562)."""
    d = F.regexp_replace(value, r"[^0-9]", "")
    return F.when(
        F.length(d) == 14,
        F.concat_ws(
            "",
            F.substring(d, 1, 2), F.lit("."),
            F.substring(d, 3, 3), F.lit("."),
            F.substring(d, 6, 3), F.lit("/"),
            F.substring(d, 9, 4), F.lit("-"),
            F.substring(d, 13, 2),
        ),
    )


def fix_email(value: Column) -> Column:
    """No '@' -> lowercase, strip spaces, append @example.com (:564-569)."""
    return F.when(
        ~value.contains("@"),
        F.concat(
            F.regexp_replace(F.lower(value), " ", ""), F.lit("@example.com")
        ),
    )


def fix_date(value: Column) -> Column:
    """>=3 digit groups -> dd/MM/yyyy, zero-padded, 2-digit year gets a
    '20' century (:571-587)."""
    groups = F.regexp_extract_all(value, F.lit(r"(\d+)"), 1)
    day = F.lpad(F.element_at(groups, 1), 2, "0")
    month = F.lpad(F.element_at(groups, 2), 2, "0")
    raw_year = F.element_at(groups, 3)
    year = F.when(F.length(raw_year) == 2, F.concat(F.lit("20"), raw_year)).otherwise(
        raw_year
    )
    return F.when(
        F.size(groups) >= 3, F.concat_ws("/", day, month, year)
    )


def fix_number(value: Column) -> Column:
    """','->'.' cast double; uncastable -> 0.0 (:590-598)."""
    return F.coalesce(
        F.regexp_replace(value, ",", ".").try_cast("double"), F.lit(0.0)
    )


def fix_integer(value: Column) -> Column:
    """via double then truncation; uncastable -> 0 (:600-610)."""
    return F.coalesce(
        F.regexp_replace(value, ",", ".").try_cast("double").try_cast("long"),
        F.lit(0),
    )


def fix_boolean(value: Column) -> Column:
    """truthy/falsy word sets; anything else false (:615-623)."""
    low = F.lower(value)
    return F.when(low.isin(*_TRUTHY), F.lit(True)).otherwise(
        F.when(low.isin(*_FALSY), F.lit(False)).otherwise(F.lit(False))
    )


def try_fix_col(
    field: Column, value: Column, error_message: Column,
    today: Column | None = None,
) -> Column:
    """Full dispatch of try_fix_value (validation_panel.py:530-625) as one
    expression: returns the repaired value as a string, or null when the
    reference would give up. Routing mirrors the reference's substring
    checks on (error_message, field) in order."""
    err = F.lower(error_message)
    low_field = F.lower(field)
    return (
        F.when(err.contains("obrigatório"), fix_required_default(field, today))
        .when(
            error_message.contains("CPF") | low_field.contains("cpf"),
            fix_cpf(value),
        )
        .when(
            error_message.contains("CNPJ") | low_field.contains("cnpj"),
            fix_cnpj(value),
        )
        .when(
            err.contains("email") | low_field.contains("email"),
            fix_email(value),
        )
        .when(
            err.contains("data") | low_field.contains("date"),
            fix_date(value),
        )
        .when(err.contains("deve ser um número"), fix_number(value).cast("string"))
        .when(err.contains("deve ser um inteiro"), fix_integer(value).cast("string"))
        .when(err.contains("deve ser uma string"), value.cast("string"))
        .when(err.contains("deve ser um booleano"),
              fix_boolean(value).cast("string"))
        .otherwise(F.lit(None).cast("string"))
    )
