"""Arabic normalization + light stemming — the light10 stemmer
(Larkey, Ballesteros & Connell, "Improving stemming for Arabic
information retrieval", SIGIR 2002 / TOIS 2007), the published
algorithm behind the reference's Lucene-backed Arabic chain
(ivory/core/tokenize/LuceneArabicAnalyzer.java: ArabicNormalization-
Filter + ArabicStemFilter).

Normalization: strip tatweel + harakat diacritics, fold alef variants
to bare alef, alef maksura to ya, teh marbuta to heh. Stemming: one
prefix removal (waw needs >= 3 residual chars, articles >= 2), then a
single ordered suffix pass, each suffix removable once while >= 2
chars would remain.
"""

from __future__ import annotations

import re

# tatweel, fathatan..sukun, superscript alef
_DIACRITICS = re.compile("[ـً-ْٰ]")
_ALEFS = re.compile("[آأإٱ]")  # آ أ إ ٱ -> ا

_PREFIXES = ("وال", "بال", "كال", "فال", "ال", "لل", "و")
_SUFFIXES = ("ها", "ان", "ات", "ون", "ين", "يه", "ية", "ه", "ة", "ي")


def arabic_normalize(token: str) -> str:
    t = _DIACRITICS.sub("", token)
    t = _ALEFS.sub("ا", t)
    t = t.replace("ى", "ي")  # ى -> ي
    t = t.replace("ة", "ه")  # ة -> ه
    return t


def arabic_stem(token: str) -> str:
    """Light10 stem of a normalized token."""
    t = token
    for p in _PREFIXES:
        if t.startswith(p):
            keep = 3 if p == "و" else 2
            if len(t) - len(p) >= keep:
                t = t[len(p):]
            break
    for s in _SUFFIXES:
        if t.endswith(s) and len(t) - len(s) >= 2:
            t = t[: -len(s)]
    return t


def arabic_light(token: str) -> str:
    return arabic_stem(arabic_normalize(token))
