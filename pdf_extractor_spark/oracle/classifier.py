"""Rule classification + fusion with reference semantics.

classify_by_rules: document_classifier.py:84-115 —
  per doc type: keywords score 1 each on \\b<escaped kw>\\b IGNORECASE search;
  regex patterns score 2 each on IGNORECASE|MULTILINE search; normalized
  score/max_score; strictly-greater argmax across types (ties -> first in
  iteration order); (None, 0.0) when text empty or nothing scores.

fuse_classification: document_classifier.py:157-173 —
  ml>0.7 -> ml; rule>0.6 -> rule; both>0 -> max (ties -> rule); single>0 ->
  it; else (None, 0.0).
"""

from __future__ import annotations

import re
from functools import lru_cache

from ..config import DocTypePattern


@lru_cache(maxsize=4096)
def _kw_re(keyword: str) -> re.Pattern:
    return re.compile(r"\b" + re.escape(keyword) + r"\b", re.IGNORECASE)


@lru_cache(maxsize=4096)
def _pat_re(pattern: str) -> re.Pattern:
    return re.compile(pattern, re.IGNORECASE | re.MULTILINE)


# Characters that are literals in regex source (no metacharacter), and
# whose case behavior is 1:1-stable so an IGNORECASE regex match implies
# a casefold-substring hit (multi-char folds like ß→ss are excluded by
# the stability guard below).
_LIT_SAFE = re.compile(r"[^$^*+?.()\[\]{}\\|]+")


@lru_cache(maxsize=4096)
def _pat_literal(pattern: str) -> "str | None":
    """Required leading literal of `pattern` (casefolded), or None.

    Soundness: if the compiled pattern (IGNORECASE|MULTILINE) matches
    anywhere in a text, the returned literal appears in text.casefold().
    Conservative guards — any of these disables the prefilter for the
    pattern rather than risking a wrong skip:
      * '|' anywhere (a leading run before an alternation is not
        required: 'ABC|DEF');
      * the char after the run is *, ?, or { (the run's LAST char is
        optional: 'DANFEX*' requires only 'DANFE') — handled by
        dropping that char;
      * any literal char with multi-char or unstable case folding
        (ß, İ, …), where casefold-substring reasoning breaks;
      * runs shorter than 4 chars (too weak to pay for the scan)."""
    if "|" in pattern:
        return None
    m = _LIT_SAFE.match(pattern)
    if not m:
        return None
    lit = m.group(0)
    if len(pattern) > len(lit) and pattern[len(lit)] in "*?{":
        lit = lit[:-1]
    if len(lit) < 4:
        return None
    for ch in lit:
        if (
            len(ch.lower()) != 1
            or len(ch.casefold()) != 1
            or ch.lower() != ch.casefold()
        ):
            return None
    return lit.casefold()


@lru_cache(maxsize=64)
def _kw_union_re(kws: tuple[str, ...]) -> re.Pattern:
    """One zero-width scan for ALL keywords: `\\b(?=(kw1|kw2|...)\\b)`.

    Zero-width, so no occurrence is consumed (every start position is
    tried — a keyword beginning inside another's span is still found);
    longest-first ordering makes the capture the longest keyword matching
    at that position, and any shorter keyword matching at the same
    position is recovered by _kws_in_snippet (it is \\b-contained in the
    captured text, so the original per-keyword regex finds it there).
    Presence semantics are therefore EXACTLY those of searching each
    `\\b<kw>\\b` separately (document_classifier.py:84-115) — guarded by
    the fuzz test in tests/test_property_parity.py — at one text scan
    instead of len(kws): the classifier kernel was 89% re.search time,
    and keywords were 2/3 of the scans."""
    ordered = sorted(set(kws), key=len, reverse=True)
    return re.compile(
        r"\b(?=(" + "|".join(re.escape(k) for k in ordered) + r")\b)",
        re.IGNORECASE,
    )


@lru_cache(maxsize=65536)
def _kws_in_snippet(kws: tuple[str, ...], snippet: str) -> frozenset[str]:
    """Keywords present in a captured snippet, by the ORIGINAL per-keyword
    regexes — the exactness of the combined scan reduces to these."""
    return frozenset(k for k in kws if _kw_re(k).search(snippet))


def _keyword_presence(text: str, kws: tuple[str, ...]) -> frozenset[str]:
    if not kws:
        return frozenset()
    present: set[str] = set()
    seen: set[str] = set()
    for m in _kw_union_re(kws).finditer(text):
        g = m.group(1)
        if g in seen:
            continue
        seen.add(g)
        present |= _kws_in_snippet(kws, g)
        if len(present) == len(kws):
            break
    return frozenset(present)


def classify_by_rules(
    text: str | None, patterns: dict[str, DocTypePattern]
) -> tuple[str | None, float]:
    if not text or not patterns:
        return None, 0.0

    all_kws = tuple(
        sorted({kw for pd in patterns.values() for kw in pd.keywords})
    )
    present = _keyword_presence(text, all_kws)
    text_cf = text.casefold()

    best_match: str | None = None
    best_score = 0.0
    for doc_type, pd in patterns.items():
        score = 0
        max_score = 0
        for kw in pd.keywords:
            max_score += 1
            if kw in present:
                score += 1
        for pat in pd.patterns:
            max_score += 2
            lit = _pat_literal(pat)
            if lit is not None and lit not in text_cf:
                continue  # required literal absent -> search cannot match
            if _pat_re(pat).search(text):
                score += 2
        if max_score > 0:
            normalized = score / max_score
            if normalized > best_score:
                best_score = normalized
                best_match = doc_type
    return best_match, best_score


def fuse_classification(
    rule_type: str | None,
    rule_score: float,
    ml_type: str | None = None,
    ml_score: float = 0.0,
) -> tuple[str | None, float]:
    if ml_score > 0.7:
        return ml_type, ml_score
    if rule_score > 0.6:
        return rule_type, rule_score
    if ml_score > 0 and rule_score > 0:
        if ml_score > rule_score:
            return ml_type, ml_score
        return rule_type, rule_score
    if ml_score > 0:
        return ml_type, ml_score
    if rule_score > 0:
        return rule_type, rule_score
    return None, 0.0
