"""Language ops with reference semantics (language_detector.py:29-85).

The reference detects language with the seeded `langdetect` package; that
package is not part of our runtime, so detection here is a deterministic
n-gram/stopword heuristic (public-knowledge technique) with the same
*contract*: <10 stripped chars -> "unknown", else a 2-letter ISO code.
Determinism matters more than linguistic accuracy: the SAME function runs in
the oracle and inside the Spark pandas UDF, so the normalization branch
(CJK vs whitespace-collapse) is identical by construction.

preprocess_for_language replicates language_detector.py:67-85 exactly:
strip -> remove control chars [\\x00-\\x1F\\x7F-\\x9F] -> collapse \\s+ to a
single space UNLESS lang is zh/ja/ko. This is the invariant-bearing text
transform (fixtures at tests/test_language_detector.py:35-52).
"""

from __future__ import annotations

import re

_CONTROL_RE = re.compile(r"[\x00-\x1F\x7F-\x9F]")
_WS_RE = re.compile(r"\s+")

# Minimal stopword profiles for the languages the reference's name table
# covers (language_detector.py:49-64). Order fixes deterministic tie-breaks.
_STOPWORDS: list[tuple[str, frozenset[str]]] = [
    ("en", frozenset("the and of to in is a for with that this it on are".split())),
    ("pt", frozenset("de e o a que do da em um para com não uma os no se na por".split())),
    ("es", frozenset("de la que el en y a los del se las por un para con una su".split())),
    ("fr", frozenset("de la le et les des en un du une que est pour qui dans".split())),
    ("de", frozenset("der die und in den von zu das mit sich des auf für ist".split())),
    ("it", frozenset("di che e la il un a per in una sono mi si lo ho".split())),
    ("nl", frozenset("de het een en van ik te dat die in je niet is was op".split())),
]

_CJK_RANGES = (
    (0x4E00, 0x9FFF),   # CJK Unified Ideographs
    (0x3400, 0x4DBF),   # CJK Extension A
)
_HIRAGANA = (0x3040, 0x309F)
_KATAKANA = (0x30A0, 0x30FF)
_HANGUL = ((0xAC00, 0xD7AF), (0x1100, 0x11FF))
_CYRILLIC = (0x0400, 0x04FF)
_ARABIC = (0x0600, 0x06FF)
_DEVANAGARI = (0x0900, 0x097F)


def _in(cp: int, rng: tuple[int, int]) -> bool:
    return rng[0] <= cp <= rng[1]


def detect_language(text: str | None) -> str:
    """Deterministic language guess; 'unknown' for <10 stripped chars
    (contract per language_detector.py:31-32)."""
    if not text or len(text.strip()) < 10:
        return "unknown"

    sample = text[:2000]
    han = hira = kata = hangul = cyr = ar = dev = 0
    for ch in sample:
        cp = ord(ch)
        if any(_in(cp, r) for r in _CJK_RANGES):
            han += 1
        elif _in(cp, _HIRAGANA):
            hira += 1
        elif _in(cp, _KATAKANA):
            kata += 1
        elif any(_in(cp, r) for r in _HANGUL):
            hangul += 1
        elif _in(cp, _CYRILLIC):
            cyr += 1
        elif _in(cp, _ARABIC):
            ar += 1
        elif _in(cp, _DEVANAGARI):
            dev += 1

    script_total = han + hira + kata + hangul + cyr + ar + dev
    if script_total >= 3:
        if hira + kata > 0 and hira + kata >= han // 4:
            return "ja"
        if hangul > han:
            return "ko"
        if han > 0:
            return "zh"
        if cyr >= max(ar, dev):
            return "ru"
        if ar >= dev:
            return "ar"
        return "hi"

    tokens = re.findall(r"[a-zà-ÿ]+", sample.lower())
    if not tokens:
        return "unknown"
    best_lang, best_hits = "en", -1
    for lang, words in _STOPWORDS:
        hits = sum(1 for t in tokens if t in words)
        if hits > best_hits:
            best_lang, best_hits = lang, hits
    if best_hits <= 0:
        # no stopword evidence: accented latin leans pt, else en
        return "pt" if any(ord(c) > 0x7F for c in sample) else "en"
    return best_lang


# Code -> full name map, exactly language_detector.py:49-65 (unknown codes
# pass through unchanged).
LANGUAGE_NAMES = {
    "en": "English",
    "pt": "Portuguese",
    "es": "Spanish",
    "fr": "French",
    "de": "German",
    "it": "Italian",
    "nl": "Dutch",
    "ru": "Russian",
    "zh": "Chinese",
    "ja": "Japanese",
    "ko": "Korean",
    "ar": "Arabic",
    "hi": "Hindi",
    "unknown": "Unknown",
}


def get_language_name(lang_code: str) -> str:
    return LANGUAGE_NAMES.get(lang_code, lang_code)


def preprocess_for_language(text: str | None, lang_code: str | None) -> str | None:
    """Reference semantics (language_detector.py:67-85): falsy text returns
    as-is; strip; remove control chars; collapse whitespace unless zh/ja/ko."""
    if not text:
        return text
    text = text.strip()
    text = _CONTROL_RE.sub("", text)
    if lang_code not in ("zh", "ja", "ko"):
        text = _WS_RE.sub(" ", text)
    return text
