"""German (Snowball) stemmer — implemented from the published algorithm
(M.F. Porter, snowballstem.org "German stemming algorithm"; reproduces
the behavior of the stemmer inside the reference's German analysis chain,
ivory/core/tokenize/ tokenizer family — reproduced, not copied).

Like stemmer.py (English Porter), this is the single implementation the
oracle, the Spark build path and the query path all share, so rank
identity under galago_de holds end-to-end regardless of any divergence
from other Snowball ports.
"""

from __future__ import annotations

_VOWELS = set("aeiouyäöü")
_S_ENDING = set("bdfghklmnrt")  # valid before step-1 's' removal
_ST_ENDING = set("bdfghklmnt")  # valid before step-2 'st' removal


def _prelude(word: str) -> str:
    """ß→ss; u/y between vowels marked upper (consonantal use)."""
    w = word.replace("ß", "ss")
    chars = list(w)
    for i in range(1, len(chars) - 1):
        if chars[i] == "u" and chars[i - 1] in _VOWELS and chars[i + 1] in _VOWELS:
            chars[i] = "U"
        elif chars[i] == "y" and chars[i - 1] in _VOWELS and chars[i + 1] in _VOWELS:
            chars[i] = "Y"
    return "".join(chars)


def _regions(w: str) -> tuple[int, int]:
    """R1/R2 start offsets; R1 adjusted to begin at position >= 3."""

    def after_first_vc(start: int) -> int:
        # NOTE: no lowercasing here — the prelude marks intervocalic u/y
        # as 'U'/'Y' precisely so they count as CONSONANTS in the region
        # scan (bauen -> baUen -> R1=3 -> 'bau')
        for i in range(start, len(w) - 1):
            if w[i] in _VOWELS and w[i + 1] not in _VOWELS:
                return i + 2
        return len(w)

    r1 = after_first_vc(0)
    r2 = after_first_vc(r1)
    if r1 < 3:
        r1 = 3
    return r1, r2


def german_stem(word: str) -> str:
    if len(word) <= 2:
        return word.replace("ß", "ss")
    w = _prelude(word)
    r1, r2 = _regions(w)

    def in_r1(pos: int) -> bool:
        return pos >= r1

    def in_r2(pos: int) -> bool:
        return pos >= r2

    # step 1: longest of (em, ern, er) | (e, en, es) [+ optional niss-s] | s
    for suf in ("ern", "em", "er"):
        if w.endswith(suf) and in_r1(len(w) - len(suf)):
            w = w[: -len(suf)]
            break
    else:
        for suf in ("en", "es", "e"):
            if w.endswith(suf) and in_r1(len(w) - len(suf)):
                w = w[: -len(suf)]
                if w.endswith("niss"):  # e.g. verständnisse → verständnis
                    w = w[:-1]
                break
        else:
            if (
                w.endswith("s")
                and in_r1(len(w) - 1)
                and len(w) >= 2
                and w[-2] in _S_ENDING
            ):
                w = w[:-1]

    # step 2: longest of (en, er, est) | st (with valid ending, stem >= 3)
    for suf in ("est", "en", "er"):
        if w.endswith(suf) and in_r1(len(w) - len(suf)):
            w = w[: -len(suf)]
            break
    else:
        if (
            w.endswith("st")
            and in_r1(len(w) - 2)
            and len(w) >= 6
            and w[-3] in _ST_ENDING
        ):
            w = w[:-2]

    # step 3: derivational suffixes in R2
    if w.endswith(("end", "ung")):
        if in_r2(len(w) - 3):
            w = w[:-3]
            if w.endswith("ig") and in_r2(len(w) - 2) and not w.endswith("eig"):
                w = w[:-2]
    elif w.endswith(("isch",)):
        if in_r2(len(w) - 4) and not w.endswith("eisch"):
            w = w[:-4]
    elif w.endswith(("ig", "ik")):
        if in_r2(len(w) - 2) and not (len(w) >= 3 and w[-3] == "e"):
            w = w[:-2]
    elif w.endswith(("lich", "heit")):
        if in_r2(len(w) - 4):
            w = w[:-4]
            for pre in ("er", "en"):
                if w.endswith(pre) and in_r1(len(w) - 2):
                    w = w[:-2]
                    break
    elif w.endswith("keit"):
        if in_r2(len(w) - 4):
            w = w[:-4]
            if w.endswith("lich") and in_r2(len(w) - 4):
                w = w[:-4]
            elif w.endswith("ig") and in_r2(len(w) - 2):
                w = w[:-2]

    # postlude: unmark U/Y, strip umlauts
    return (
        w.replace("U", "u")
        .replace("Y", "y")
        .replace("ä", "a")
        .replace("ö", "o")
        .replace("ü", "u")
    )
