"""Template field extraction with reference semantics (extractor.py:249-272).

For each template field with a 'regex': re.search(pattern, all_text,
re.MULTILINE); take group(1) if the pattern has groups else group(0);
type conversions: date+format -> datetime.strptime (failure keeps the raw
string), decimal -> float with ','->'.' (failure keeps the raw string).
Fields that do not match are simply absent from the result.

The reference's template path actually crashes on a missing `re` import
(extractor.py:255 vs :1-13); intended semantics implemented per SURVEY.md §2.9.
"""

from __future__ import annotations

import re
from datetime import datetime
from functools import lru_cache


@lru_cache(maxsize=4096)
def _tpl_re(pattern: str) -> re.Pattern:
    return re.compile(pattern, re.MULTILINE)


def extract_template_fields(all_text: str | None, template: dict) -> dict:
    """-> {field_name: extracted value (str | float | datetime)}."""
    if all_text is None:
        return {}
    out: dict = {}
    for field_name, info in template.get("fields", {}).items():
        if "regex" not in info:
            continue
        m = _tpl_re(info["regex"]).search(all_text)
        if not m:
            continue
        value = m.group(1) if m.groups() else m.group(0)
        if info.get("type") == "date" and "format" in info:
            try:
                value = datetime.strptime(value, info["format"])
            except ValueError:
                pass
        elif info.get("type") == "decimal":
            try:
                value = float(value.replace(",", "."))
            except ValueError:
                pass
        out[field_name] = value
    return out
