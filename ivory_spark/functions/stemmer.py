"""Porter stemmer — implemented from the published algorithm
(M.F. Porter, "An algorithm for suffix stripping", Program 14(3) 1980;
the de-facto public spec at tartarus.org/martin/PorterStemmer/).

Plays the role of the English stemmer inside Ivory's default analysis
chain (ivory/core/tokenize/GalagoTokenizer.java:788-832 — Galago's
Porter2 stemmer; reproduced behavior, not copied code). Classic Porter
and Porter2 differ on a small suffix set; this module implements classic
Porter faithfully, and the numpy oracle, the Spark build path and the
query path all share THIS implementation, so rank identity holds
end-to-end regardless of the variant choice.

Pure-Python, no dependencies; called from Arrow-batched pandas UDFs
(stemming is not expressible as a JVM column expression, so galago_en
tokenization is the documented Python-UDF path — see
functions/tokenizer.py).
"""

from __future__ import annotations

_VOWELS = set("aeiou")


def _is_cons(word: str, i: int) -> bool:
    c = word[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """m in the [C](VC)^m[V] decomposition."""
    m = 0
    prev_vowel = False
    for i in range(len(stem)):
        if _is_cons(stem, i):
            if prev_vowel:
                m += 1
            prev_vowel = False
        else:
            prev_vowel = True
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(word: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and _is_cons(word, len(word) - 1)
    )


def _cvc(word: str) -> bool:
    """ends consonant-vowel-consonant, final consonant not w, x or y."""
    if len(word) < 3:
        return False
    return (
        _is_cons(word, len(word) - 3)
        and not _is_cons(word, len(word) - 2)
        and _is_cons(word, len(word) - 1)
        and word[-1] not in "wxy"
    )


def _replace(word: str, suffix: str, repl: str, min_m: int) -> str | None:
    """If word ends with suffix and measure(stem) > min_m, replace."""
    stem = word[: len(word) - len(suffix)]
    if _measure(stem) > min_m:
        return stem + repl
    return None


# (suffix, replacement) tables from the paper, steps 2-4
_STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
    ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
]
_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]
_STEP4 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
]


def porter_stem(word: str) -> str:
    if len(word) <= 2:
        return word
    w = word

    # step 1a: plurals
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # step 1b: -ed / -ing
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        did = False
        if w.endswith("ed") and _has_vowel(w[:-2]):
            w, did = w[:-2], True
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            w, did = w[:-3], True
        if did:
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif _ends_double_cons(w) and w[-1] not in "lsz":
                w = w[:-1]
            elif _measure(w) == 1 and _cvc(w):
                w += "e"

    # step 1c: y -> i
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # step 2 (longest-match by scan order is safe: the table's suffixes
    # are mutually non-nested at equal end positions except the *li /
    # *ation families, ordered longest-first below per family)
    for suf, repl in sorted(_STEP2, key=lambda x: -len(x[0])):
        if w.endswith(suf):
            r = _replace(w, suf, repl, 0)
            if r is not None:
                w = r
            break

    # step 3
    for suf, repl in sorted(_STEP3, key=lambda x: -len(x[0])):
        if w.endswith(suf):
            r = _replace(w, suf, repl, 0)
            if r is not None:
                w = r
            break

    # step 4: drop suffix when m > 1 ("ion" needs preceding s or t)
    for suf in sorted(_STEP4, key=len, reverse=True):
        if w.endswith(suf):
            stem = w[: len(w) - len(suf)]
            if _measure(stem) > 1:
                if suf == "ion" and not stem.endswith(("s", "t")):
                    break
                w = stem
            break

    # step 5a: drop final e
    if w.endswith("e"):
        m = _measure(w[:-1])
        if m > 1 or (m == 1 and not _cvc(w[:-1])):
            w = w[:-1]
    # step 5b: -ll -> -l when m > 1
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]
    return w
