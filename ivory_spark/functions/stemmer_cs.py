"""Czech light stemmer — the Dolamic–Savoy light stemmer ("Indexing and
stemming approaches for the Czech language", IP&M 2009), the published
algorithm behind the reference's ivory/core/tokenize/CzechStemmer.java
(behavior reproduced from that spec, rule order matched to the
reference: removeCase then removePossessives, each ending tried
longest-context-first with palatalisation where the table calls for it).

One reference quirk is reproduced deliberately: the -ště/-šti/-šté →
"sk" palatalisation branch compares a 3-char ending against the last
TWO characters (CzechStemmer.java:61-68), so it can never fire; we
preserve that (the final 1-char delete covers those endings) to keep
stem parity with reference-built indexes.
"""

from __future__ import annotations


def _palatalise(w: str) -> str:
    if w.endswith(("ci", "ce", "či", "če")):
        return w[:-2] + "k"
    if w.endswith(("zi", "ze", "ži", "že")):
        return w[:-2] + "h"
    if w.endswith(("čtě", "čti", "čté")):
        return w[:-3] + "ck"
    # -ště/-šti/-šté → "sk" intentionally absent (see module docstring)
    return w[:-1]


def _remove_case(w: str) -> str:
    n = len(w)
    if n > 7 and w.endswith("atech"):
        return w[:-5]
    if n > 6:
        if w.endswith("ětem"):
            return _palatalise(w[:-3])
        if w.endswith("atům"):
            return w[:-4]
    if n > 5:
        if w.endswith(("ech", "ich", "ích")):
            return _palatalise(w[:-2])
        if w.endswith(("ého", "ěmi", "emi", "ému", "ěte", "ěti",
                       "iho", "ího", "ími", "imu")):
            return _palatalise(w[:-2])
        if w.endswith(("ách", "ata", "aty", "ých", "ama", "ami",
                       "ové", "ovi", "ými")):
            return w[:-3]
    if n > 4:
        if w.endswith("em"):
            return _palatalise(w[:-1])
        if w.endswith(("es", "ém", "ím")):
            return _palatalise(w[:-2])
        if w.endswith("ům"):
            return w[:-2]
        if w.endswith(("at", "ám", "os", "us", "ým", "mi", "ou")):
            return w[:-2]
    if n > 3:
        if w.endswith(("e", "i", "í", "ě")):
            return _palatalise(w)
        if w.endswith(("u", "y", "ů", "a", "o", "á", "é", "ý")):
            return w[:-1]
    return w


def _remove_possessives(w: str) -> str:
    if len(w) > 5:
        if w.endswith(("ov", "ův")):
            return w[:-2]
        if w.endswith("in"):
            return _palatalise(w[:-1])
    return w


def czech_stem(token: str) -> str:
    """Light stem of a lowercased Czech token."""
    return _remove_possessives(_remove_case(token.lower()))
